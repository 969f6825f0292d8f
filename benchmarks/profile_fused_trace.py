"""Device-trace profile of the fused whole-run SMC program (bench flagship).

Captures a jax.profiler trace around warm fused runs at N=1e5, then parses
the perfetto trace.json.gz and aggregates TensorCore op durations by HLO
name prefix — the REAL in-run cost split (the fori-amortized numbers in
benchmarks/profile_step.py measure kernels in isolation, which inflates
them ~2x vs their fused-run cost; docs/PERF.md).

Usage: python benchmarks/profile_fused_trace.py [N]
Writes the trace under /tmp/smc_trace and prints the top op groups.
"""
import collections
import glob
import gzip
import json
import re
import sys
import time

import jax

from smc_tpu.utils.compile_cache import enable_persistent_cache


def capture(n=100_000, runs=3, outdir="/tmp/smc_trace"):
    from smc_tpu import SMCConfig, run_smc_on_device
    from smc_tpu.models.michaelis_menten import MichaelisMentenModel
    from smc_tpu.smc.driver import make_run_on_device

    model = MichaelisMentenModel.default(method="pallas_exact")
    cfg = SMCConfig(n_particles=n)
    run_fn = make_run_on_device(model, cfg)
    s = run_smc_on_device(model, cfg, jax.random.key(0), run_fn=run_fn)
    jax.block_until_ready(s.particles)

    with jax.profiler.trace(outdir):
        for seed in range(1, runs + 1):
            s = run_smc_on_device(model, cfg, jax.random.key(seed),
                                  run_fn=run_fn)
            jax.block_until_ready(s.particles)
    return outdir


_GROUP_RES = [
    # (label, regex on event name)
    ("likelihood (pallas mm)", r"mm_loglik|pallas|lambert"),
    ("exp/weights (gamma ladder)", r"exp|ladder"),
    ("cumsum (resample/copy)", r"cumsum|scan|reduce_window"),
    ("scatter (resample/copy)", r"scatter"),
    ("sort/gather", r"sort|gather|take"),
    ("reduce (sums/max/ess)", r"reduce"),
    ("cholesky/cov (mutation)", r"cholesky|dot|triangular"),
    ("rng", r"threefry|random|rng|iota"),
    ("while/loop overhead", r"while|condition|tuple|copy"),
]


def parse(outdir):
    paths = glob.glob(outdir + "/**/*trace.json.gz", recursive=True)
    if not paths:
        raise SystemExit(f"no trace.json.gz under {outdir}")
    path = max(paths, key=lambda p: p)  # latest session
    with gzip.open(path, "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"]

    # device-compute track pids (TensorCore "/device:TPU" or TPU core ops)
    dev_pids = set()
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            name = e.get("args", {}).get("name", "")
            if ("TPU" in name and "Host" not in name) or "/device:" in name:
                dev_pids.add(e["pid"])

    tot = collections.Counter()
    cnt = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "")
        if name.startswith("$") or name in ("unknown",):
            continue
        dur = e.get("dur", 0)  # us
        total += dur
        key = re.sub(r"[.\d]+$", "", name)
        tot[key] += dur
        cnt[key] += 1
    return tot, cnt, total


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    enable_persistent_cache()
    t0 = time.time()
    outdir = capture(n=n)
    print(f"captured in {time.time() - t0:.1f}s", flush=True)
    tot, cnt, total = parse(outdir)
    print(f"\ntotal device time: {total / 1e3:.2f} ms over 3 runs")
    print(f"{'op group':<52} {'ms':>9} {'#':>6} {'%':>6}")
    for k, v in tot.most_common(40):
        print(f"{k:<52} {v / 1e3:9.2f} {cnt[k]:6d} {100 * v / total:6.1f}")


if __name__ == "__main__":
    main()
