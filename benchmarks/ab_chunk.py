"""A/B: per-dispatch batch width (particle_chunk) for the DAE march.

Run on the real chip:  python benchmarks/ab_chunk.py [secs_per_probe]

PERF.md pins the DAE march as bound by while-loop iteration overhead and
small-op scheduling, both of which are fixed costs per scan iteration —
and therefore amortized by a wider lane axis. This sweeps chunk in
{64, 128, 256, 512} (1,920 - 15,360 lanes) on the full likelihood march,
interleaved in one process so tunnel/session variance cancels.
Throughput is reported per particle (chunk / wall).

Measured 2026-08-19 (one v5e chip, two interleaved rounds, docs/PERF.md):
64 -> 1,253-1,275 pps; 128 -> 1,387-1,388; 256 -> 1,373-1,374;
512 -> 1,473-1,476 (+6.2% over the round-2 default 128). 512 is now the
flagship default (models/methanation.py particle_chunk).

Memory check at 512: the largest live buffer set is the lagged LU
factors, (7, 7, nx=51, 15360) fp32 = 154 MB in HBM — far under budget;
VMEM residency per op is unchanged (ops stream over the lane axis).
"""
import sys
import time

import jax
import jax.numpy as jnp

from smc_tpu.models.methanation import MethanationModel

CHUNKS = (64, 128, 256, 512)


def make(chunk):
    model = MethanationModel.default(n_conditions=30, particle_chunk=chunk)
    fn = jax.jit(lambda th: model.log_likelihood(th)[0])
    theta = jnp.tile(jnp.asarray([[13.04, 52.2e3, 1.147e5, 96.7e3, 5.0]],
                                 jnp.float32), (chunk, 1))
    fn(theta).block_until_ready()  # compile
    return fn, theta


def time_reps(fn, theta, secs):
    fn(theta).block_until_ready()  # warm
    t0 = time.perf_counter()
    reps = 0
    while time.perf_counter() - t0 < secs:
        fn(theta).block_until_ready()
        reps += 1
    return (time.perf_counter() - t0) / reps


def main():
    secs = float(sys.argv[1]) if len(sys.argv) > 1 else 6.0
    probes = {}
    for c in CHUNKS:
        print(f"compiling chunk={c} ...", flush=True)
        probes[c] = make(c)
    for rnd in range(2):
        line = [f"round {rnd}:"]
        for c in CHUNKS:
            fn, theta = probes[c]
            dt = time_reps(fn, theta, secs)
            line.append(f"chunk {c:4d} {c / dt:7.1f} pps")
        print("   ".join(line), flush=True)


if __name__ == "__main__":
    main()
