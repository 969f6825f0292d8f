"""A/B: streaming-merge ancestor kernel vs the scatter-fill resample.

Two measurements on one chip, interleaved in one process:
1. isolated resample apply at N=1e5 and 1e6 (fori-amortized),
2. the whole fused bench.py flagship run (MM pallas_exact, N=1e5).

The merge variant is kernels.residual_systematic_apply's TPU path
(ops/resample_pallas.sorted_offsets_to_ancestors + one sorted gather);
the scatter variant forces the _use_merge_kernel gate off.
"""
import time

import jax
import jax.numpy as jnp

from smc_tpu.utils.compile_cache import enable_persistent_cache


def micro(n, reps=50):
    from smc_tpu.smc import kernels
    k = jax.random.PRNGKey(0)
    w = jax.random.dirichlet(k, jnp.full(n, 0.1))
    parts = jax.random.normal(jax.random.PRNGKey(1), (n, 3))
    ll = jax.random.normal(jax.random.PRNGKey(2), (n,))

    @jax.jit
    def run(key):
        def body(i, c):
            p, l = kernels.residual_systematic_apply(
                jax.random.fold_in(key, i), w, (c, ll))
            return p
        return jax.lax.fori_loop(0, reps, body, parts)

    out = run(k)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = run(jax.random.PRNGKey(9))
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e6


def fused_run(secs=8.0):
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


if __name__ == "__main__":
    enable_persistent_cache()
    from smc_tpu.smc import kernels
    gate = kernels._use_merge_kernel
    for variant in ("merge", "scatter", "merge", "scatter"):
        kernels._use_merge_kernel = (
            gate if variant == "merge" else (lambda n: False))
        for n in (100_000, 1_000_000):
            print(f"{variant} apply @{n:.0e}: {micro(n):8.0f} us/step",
                  flush=True)
    for variant in ("merge", "scatter", "merge"):
        kernels._use_merge_kernel = (
            gate if variant == "merge" else (lambda n: False))
        print(f"{variant} fused run: {fused_run() / 1e6:.2f} M updates/s",
              flush=True)
