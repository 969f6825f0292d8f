#!/bin/bash
# Round-4 chip schedule, part 3: compacted SBC continuation (only the
# still-tempering replicates), then the 1e6 march for the rest of the
# round (STOP file drains it cleanly before round-end bench).
set -u
cd "$(dirname "$0")/.."
R=benchmarks/results
echo "chain-c: sbc_cont start $(date -u +%H:%M:%S)"
python benchmarks/sbc_methanation_cont.py > "$R/sbc_cont_r04.log" 2>&1
echo "chain-c: sbc_cont rc=$? $(date -u +%H:%M:%S)"
echo "chain-c: meth_1e6 start $(date -u +%H:%M:%S)"
python benchmarks/run_methanation_1e6.py > "$R/meth_1e6_r04.log" 2>&1
echo "chain-c: meth_1e6 rc=$? $(date -u +%H:%M:%S)"
echo CHAIN_C_DONE
