"""A/B: twisted (burn-at-both-ends) block-Thomas vs the standard scan.

Run on the real chip:  python benchmarks/ab_babe.py [secs_per_probe]

PERF.md pins the DAE march as bound by fixed per-scan-iteration costs
(while-loop tax + small-op scheduling) — chain DEPTH, not FLOPs. BABE
(ops/dae_fast.block_thomas_babe_factor) runs both elimination chains as
one lane-stacked scan: half the iterations at equal total FLOPs, double
the lane width per iteration (round-3 verdict item 5). This interleaves
solver="thomas" and solver="babe" full likelihood marches in one process
(tunnel/session variance cancels), two rounds, at the flagship
configuration (nx=51, 30 conditions, chunk=512).

Measured 2026-08-20 (one v5e chip, two interleaved rounds, recorded in
docs/PERF.md): thomas 1469.6/1475.1 pps, babe 969.4/1081.4 — BABE is
27-34% SLOWER end-to-end. The 2x-lane stacked bodies + the lane-axis
concatenates cost more in Mosaic scheduling and data movement than the
halved while-loop count recovers (the _NX_UNROLL=10 / fused-factor
pathology from a third direction). BABE stays a tested non-default.
"""
import sys
import time

import jax
import jax.numpy as jnp

from smc_tpu.models.methanation import MethanationModel

SOLVERS = ("thomas", "babe")


def make(solver, chunk=512):
    model = MethanationModel.default(n_conditions=30, particle_chunk=chunk,
                                     solver=solver)
    fn = jax.jit(lambda th: model.log_likelihood(th)[0])
    theta = jnp.tile(jnp.asarray([[13.04, 52.2e3, 1.147e5, 96.7e3, 5.0]],
                                 jnp.float32), (chunk, 1))
    fn(theta).block_until_ready()  # compile
    return fn, theta, chunk


def time_reps(fn, theta, secs):
    fn(theta).block_until_ready()  # warm
    t0 = time.perf_counter()
    reps = 0
    while time.perf_counter() - t0 < secs:
        fn(theta).block_until_ready()
        reps += 1
    return (time.perf_counter() - t0) / reps


def main():
    secs = float(sys.argv[1]) if len(sys.argv) > 1 else 8.0
    probes = {}
    for s in SOLVERS:
        print(f"compiling solver={s} ...", flush=True)
        probes[s] = make(s)
    for rnd in range(2):
        line = [f"round {rnd}:"]
        for s in SOLVERS:
            fn, theta, chunk = probes[s]
            dt = time_reps(fn, theta, secs)
            line.append(f"{s:6s} {chunk / dt:7.1f} pps")
        print("   ".join(line), flush=True)
    print("AB_BABE_DONE", flush=True)


if __name__ == "__main__":
    main()
