"""A/B: per-run pipelined dispatch vs lax.map-batched dispatch (K runs/call).

The headline bench dispatches one fused full-run program per call and
pipelines the scalar fetch of run k-1 behind run k. On sessions where the
device tunnel's per-call round-trip is slow (measured 20+ ms/scalar on some
sessions vs ~0.02 ms on others), that per-run host cost caps the measured
throughput well below the device ceiling (observed spread: 70-114 M
updates/s for identical code). Batching K independent runs into ONE
device program with ``lax.map`` (sequential on device, identical per-run
work) amortizes the round-trip K-fold, so the measurement converges to the
device compute rate regardless of session tunnel health.
"""
import time

import jax
import jax.numpy as jnp
from jax import lax

from smc_tpu import SMCConfig
from smc_tpu.models.michaelis_menten import MichaelisMentenModel
from smc_tpu.smc.driver import make_full_run_on_device


def measure_per_run(run_fn, window=10.0):
    s = run_fn(jax.random.key(0))
    jax.block_until_ready(s.particles)
    t0 = time.perf_counter()
    updates = 0.0
    pending = []
    seed = 1
    while time.perf_counter() - t0 < window:
        s = run_fn(jax.random.key(seed))
        pending.append((s.gamma, s.total_lik_evals))
        seed += 1
        if len(pending) > 1:
            g, e = jax.device_get(pending.pop(0))
            assert float(g) == 1.0
            updates += float(e)
    for p in pending:
        g, e = jax.device_get(p)
        updates += float(e)
    dt = time.perf_counter() - t0
    return updates / dt, seed - 1


def measure_batched(run_fn, k=8, window=10.0):
    @jax.jit
    def run_many(key):
        keys = jax.random.split(key, k)

        def one(kk):
            s = run_fn(kk)
            return s.gamma, s.total_lik_evals

        return lax.map(one, keys)

    g, e = run_many(jax.random.key(0))
    jax.block_until_ready(e)
    assert float(jnp.min(g)) == 1.0
    t0 = time.perf_counter()
    updates = 0.0
    pending = []
    seed = 1
    while time.perf_counter() - t0 < window:
        pending.append(run_many(jax.random.key(seed)))
        seed += 1
        if len(pending) > 1:
            g, e = jax.device_get(pending.pop(0))
            assert float(jnp.min(g)) == 1.0
            updates += float(jnp.sum(e))
    for p in pending:
        g, e = jax.device_get(p)
        updates += float(jnp.sum(e))
    dt = time.perf_counter() - t0
    return updates / dt, (seed - 1) * k


def main():
    model = MichaelisMentenModel.default(method="pallas_exact")
    cfg = SMCConfig(n_particles=100_000)
    run_fn = make_full_run_on_device(model, cfg)

    ups_a, runs_a = measure_per_run(run_fn)
    print(f"per-run pipelined : {ups_a/1e6:8.1f} M updates/s  ({runs_a} runs)")
    for k in (4, 8, 16):
        ups_b, runs_b = measure_batched(run_fn, k=k)
        print(f"lax.map batch K={k:2d}: {ups_b/1e6:8.1f} M updates/s  "
              f"({runs_b} runs)")


if __name__ == "__main__":
    main()
