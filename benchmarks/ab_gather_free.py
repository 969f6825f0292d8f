"""A/B: gather-free scatter-fill resample vs ancestor gather, whole fused run.

Interleaved in one process (same tunnel session); persistent compile cache
on so each variant compiles once. Workload = the bench.py flagship (MM
pallas_exact, N=1e5).
"""
import time

import jax
import jax.numpy as jnp

from smc_tpu.utils.compile_cache import enable_persistent_cache


def run_updates_per_sec(secs=8.0):
    from smc_tpu import SMCConfig, run_smc_on_device
    from smc_tpu.models.michaelis_menten import MichaelisMentenModel
    from smc_tpu.smc.driver import make_run_on_device
    model = MichaelisMentenModel.default(method="pallas_exact")
    cfg = SMCConfig(n_particles=100_000)
    run_fn = make_run_on_device(model, cfg)
    s = run_smc_on_device(model, cfg, jax.random.key(0), run_fn=run_fn)
    jax.block_until_ready(s.particles)
    t0 = time.perf_counter()
    updates = 0.0
    seed = 1
    while time.perf_counter() - t0 < secs:
        s = run_smc_on_device(model, cfg, jax.random.key(seed), run_fn=run_fn)
        jax.block_until_ready(s.particles)
        assert float(s.gamma) == 1.0
        updates += float(s.total_lik_evals)
        seed += 1
    return updates / (time.perf_counter() - t0)


def old_apply(key, w, arrays):
    from smc_tpu.smc import kernels
    anc = kernels.residual_systematic_resample(key, w)
    return jax.tree.map(lambda v: jnp.take(v, anc, axis=0), arrays)


if __name__ == "__main__":
    enable_persistent_cache()
    from smc_tpu.smc import driver, kernels
    new_apply = kernels.residual_systematic_apply
    for variant in ("scatter-fill", "gather", "scatter-fill", "gather"):
        driver.residual_systematic_apply = (
            new_apply if variant == "scatter-fill" else old_apply)
        print(f"{variant}: {run_updates_per_sec() / 1e6:.2f} M updates/s",
              flush=True)
