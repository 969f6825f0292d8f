"""Interleaved A/B: transient lagged march vs SER-PTC steady solve.

Same process, same theta population, alternating timed blocks (tunnel
dispatch variance cancels). Flagship shape: N=256 particles x 30
conditions, chunk 128.
"""
import json
import sys
import time

import dataclasses
import jax
import jax.numpy as jnp


def timed(f, theta, seconds=6.0):
    ll, _ = f(theta)
    jax.block_until_ready(ll)
    t0 = time.perf_counter()
    reps = 0
    while time.perf_counter() - t0 < seconds:
        ll, _ = f(theta)
        jax.block_until_ready(ll)
        reps += 1
    return (time.perf_counter() - t0) / reps


def main(n: int = 256, chunk: int = 128, steps: int = 18,
         floor: float = 2.0, lag: int = 1, reuse: int = 2):
    from smc_tpu.models.methanation import MethanationModel
    base = MethanationModel.default(n_conditions=30,
                                    particle_chunk=min(n, chunk))
    steady = dataclasses.replace(base, march="steady", ptc_steps=steps,
                                 ptc_floor=floor, ptc_lag=lag,
                                 ptc_reuse_iters=reuse)
    theta = jnp.tile(jnp.asarray([[13.04, 52.2e3, 1.147e5, 96.7e3, 5.0]],
                                 jnp.float32), (n, 1))
    fa = jax.jit(base.log_likelihood)
    fb = jax.jit(steady.log_likelihood)
    # sanity: steady converges at the truth
    lla = fa(theta)[0][0]
    llb = fb(theta)[0][0]
    print(f"loglik march={float(lla):.3f} steady={float(llb):.3f}",
          flush=True)
    res = {"march": [], "steady": []}
    for _ in range(3):
        res["march"].append(n / timed(fa, theta))
        res["steady"].append(n / timed(fb, theta))
    print(json.dumps({k: [round(v, 1) for v in vals]
                      for k, vals in res.items()}))


if __name__ == "__main__":
    a = sys.argv[1:]
    main(steps=int(a[0]) if len(a) > 0 else 18,
         floor=float(a[1]) if len(a) > 1 else 2.0,
         lag=int(a[2]) if len(a) > 2 else 1,
         reuse=int(a[3]) if len(a) > 3 else 2)
