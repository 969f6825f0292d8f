"""A/B: bfloat16 block-Thomas factor storage vs fp32 (dae_fast._BF16_FACTORS).

Run on the real chip:  python benchmarks/ab_bf16_factors.py [secs_per_probe]

PERF.md's cost model PREDICTED this negative (factor traffic is a few
percent of the HBM budget, while the bf16<->f32 converts land in exactly
the scan bodies where op scheduling is the measured constraint) but it
was the one optimization claim never measured. This settles it the same
way as the other five recorded negatives: both variants compiled in one
process, interleaved rounds at the flagship configuration (nx=51, 30
conditions, chunk=512), so tunnel/session variance cancels.

Also reports accuracy: max |delta log_lik| over a 512-particle prior
probe and the number of finite/masked disagreements — a bf16-factor
modified-Newton solve carries ~3 decimal digits, which the fp32 residual
convergence masks must absorb for the variant to be admissible at all.
"""
import sys
import time

import jax
import jax.numpy as jnp

from smc_tpu.models.methanation import MethanationModel
from smc_tpu.ops import dae_fast


def make(bf16, chunk=512):
    dae_fast._BF16_FACTORS = bf16          # read at trace time
    try:
        model = MethanationModel.default(
            n_conditions=30, particle_chunk=chunk, solver="thomas")
        fn = jax.jit(lambda th: model.log_likelihood(th)[0])
        theta = jnp.tile(
            jnp.asarray([[13.04, 52.2e3, 1.147e5, 96.7e3, 5.0]],
                        jnp.float32), (chunk, 1))
        fn(theta).block_until_ready()      # compile
    finally:
        dae_fast._BF16_FACTORS = False
    return fn, theta, chunk


def time_reps(fn, theta, secs):
    fn(theta).block_until_ready()          # warm
    t0 = time.perf_counter()
    reps = 0
    while time.perf_counter() - t0 < secs:
        fn(theta).block_until_ready()
        reps += 1
    return (time.perf_counter() - t0) / reps


def main():
    secs = float(sys.argv[1]) if len(sys.argv) > 1 else 8.0
    probes = {}
    for name, bf16 in (("fp32", False), ("bf16", True)):
        print(f"compiling factors={name} ...", flush=True)
        probes[name] = make(bf16)

    # accuracy probe on a spread of prior draws
    import numpy as np
    key = jax.random.key(0)
    lo = jnp.asarray([1.0, 4e4, 1e4, 5e4, 1.0])
    hi = jnp.asarray([20.0, 6e4, 2e6, 2e5, 10.0])
    theta_p = lo + (hi - lo) * jax.random.uniform(key, (512, 5))
    la = np.asarray(probes["fp32"][0](theta_p))
    lb = np.asarray(probes["bf16"][0](theta_p))
    both = np.isfinite(la) & np.isfinite(lb)
    print(f"accuracy: max|dloglik| (both finite) = "
          f"{np.abs(la - lb)[both].max():.3e}   "
          f"finite-mask disagreements = "
          f"{int((np.isfinite(la) != np.isfinite(lb)).sum())}/512",
          flush=True)

    for rnd in range(2):
        line = [f"round {rnd}:"]
        for name in ("fp32", "bf16"):
            fn, theta, chunk = probes[name]
            dt = time_reps(fn, theta, secs)
            line.append(f"{name:5s} {chunk / dt:7.1f} pps")
        print("   ".join(line), flush=True)
    print("AB_BF16_DONE", flush=True)


if __name__ == "__main__":
    main()
