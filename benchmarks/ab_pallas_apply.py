"""A/B: streaming Pallas apply ("thomas_pl") vs XLA scan ("thomas") for the
DAE march's block-Thomas solve sweeps.

Runs both variants twice, interleaved, in ONE process (same tunnel session,
same clocks) so the comparison is not polluted by session-to-session
dispatch-latency variance. Persistent compile cache on, so each variant
compiles once.
"""
import time

import jax
import jax.numpy as jnp

from smc_tpu.utils.compile_cache import enable_persistent_cache


def run(solver, n=256, secs=8.0):
    from smc_tpu.models.methanation import MethanationModel
    model = MethanationModel.default(n_conditions=30, particle_chunk=128,
                                     solver=solver)
    theta = jnp.tile(jnp.asarray([[13.04, 52.2e3, 1.147e5, 96.7e3, 5.0]],
                                 jnp.float32), (n, 1))
    f = jax.jit(model.log_likelihood)
    ll, _ = f(theta)
    jax.block_until_ready(ll)
    t0 = time.perf_counter()
    reps = 0
    while time.perf_counter() - t0 < secs:
        ll, _ = f(theta)
        jax.block_until_ready(ll)
        reps += 1
    return n * reps / (time.perf_counter() - t0)


if __name__ == "__main__":
    enable_persistent_cache()
    for solver in ("thomas_pl", "thomas", "thomas_pl", "thomas"):
        print(f"solver={solver}: {run(solver):.1f} pps", flush=True)
