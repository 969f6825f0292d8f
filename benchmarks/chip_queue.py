"""Serial chip-job queue for the single-TPU tunnel session.

The tunnel tolerates exactly ONE TPU client process at a time (CLAUDE.md),
so long-running round work is chained: each job runs as a child process
(detached-safe — launch THIS script with setsid), and the next job starts
only when the previous one exits. Jobs are (name, argv, env) triples read
from a queue JSON; a job's nonzero exit does not stop the queue (each job
is expected to carry its own resilience, e.g. run_methanation_1e6.py
supervises itself).

Usage:
    setsid python benchmarks/chip_queue.py /tmp/queue.json \
        > /tmp/chip_queue.out 2>&1 < /dev/null &

queue.json: [{"name": ..., "argv": [...], "env": {...}}, ...]
"""
import json
import os
import subprocess
import sys
import time


def main(queue_path: str) -> None:
    jobs = json.load(open(queue_path))
    for job in jobs:
        name = job["name"]
        env = {**os.environ, **job.get("env", {})}
        t0 = time.time()
        print(f"=== [{time.strftime('%H:%M:%S')}] start {name}: "
              f"{' '.join(job['argv'])}", flush=True)
        rc = subprocess.call(job["argv"], env=env)
        print(f"=== [{time.strftime('%H:%M:%S')}] {name} exited {rc} "
              f"after {time.time() - t0:.0f}s", flush=True)
    print("CHIP_QUEUE_DONE", flush=True)


if __name__ == "__main__":
    main(sys.argv[1])
