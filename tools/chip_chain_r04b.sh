#!/bin/bash
# Round-4 chip schedule, part 2 (after evidence_scatter completed and the
# first SBC attempt was relaunched with the OOM-fixed per-replicate
# chunk): powered SBC, then the 1e6 march for the rest of the round.
set -u
cd "$(dirname "$0")/.."
R=benchmarks/results
mkdir -p "$R"
echo "chain-b: sbc_full start $(date -u +%H:%M:%S)"
python benchmarks/sbc_methanation_full.py > "$R/sbc_full_r04.log" 2>&1
echo "chain-b: sbc_full rc=$? $(date -u +%H:%M:%S)"
echo "chain-b: meth_1e6 start $(date -u +%H:%M:%S)"
python benchmarks/run_methanation_1e6.py > "$R/meth_1e6_r04.log" 2>&1
echo "chain-b: meth_1e6 rc=$? $(date -u +%H:%M:%S)"
echo CHAIN_B_DONE
