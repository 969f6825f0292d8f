#!/bin/bash
# Endgame watcher: when the 1e6 march completes CLEANLY (METH_1E6_DONE in
# its log) and its supervisor has exited (one-TPU-process rule), run the
# bf16 factor A/B on the freed chip. Crash/stop cases are left to the
# human loop (the supervisor handles restarts itself).
LOG=/root/repo/benchmarks/results/meth_1e6_r05.log
cd /root/repo
while true; do
    if grep -q "METH_1E6_DONE" "$LOG" 2>/dev/null; then
        # wait for the supervisor to fully exit
        while ps -eo args | grep -v grep | grep -q "run_methanation_1e6"; do
            sleep 10
        done
        sleep 30
        echo "=== march done, starting ab_bf16_factors $(date -u)" 
        python benchmarks/ab_bf16_factors.py 8 \
            > /root/repo/benchmarks/results/ab_bf16_r05.log 2>&1
        echo "=== ab done $(date -u)"
        break
    fi
    sleep 60
done
