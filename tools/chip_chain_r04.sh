#!/bin/bash
# Round-4 chip schedule — ONE TPU process at a time (CLAUDE.md), short
# fully-completable jobs first, then the open-ended 1e6 march:
#   1. evidence_scatter.py       (~15 min): flagship log-Z replicate spread
#   2. sbc_methanation_full.py   (~1-1.5 h): powered 5-param methanation SBC
#   3. run_methanation_1e6.py    (rest of round): north-star scale config;
#      stopped cleanly near round end via benchmarks/results/run_1e6/STOP,
#      resumable next round from its committed .smcd checkpoint.
# Launch detached (never under a Bash timeout):
#   setsid bash tools/chip_chain_r04.sh > /tmp/chain.out 2>&1 < /dev/null &
set -u
cd "$(dirname "$0")/.."
R=benchmarks/results
mkdir -p "$R"
echo "chain: evidence_scatter start $(date -u +%H:%M:%S)"
python benchmarks/evidence_scatter.py > "$R/evidence_scatter_r04.log" 2>&1
echo "chain: evidence_scatter rc=$? $(date -u +%H:%M:%S)"
echo "chain: sbc_full start $(date -u +%H:%M:%S)"
python benchmarks/sbc_methanation_full.py > "$R/sbc_full_r04.log" 2>&1
echo "chain: sbc_full rc=$? $(date -u +%H:%M:%S)"
echo "chain: meth_1e6 start $(date -u +%H:%M:%S)"
python benchmarks/run_methanation_1e6.py > "$R/meth_1e6_r04.log" 2>&1
echo "chain: meth_1e6 rc=$? $(date -u +%H:%M:%S)"
echo CHAIN_DONE
