"""Ensemble serving throughput: independent MM posteriors per second.

D independent tempered-SMC populations (one noisy MM dataset each, N
particles each, each with its own adaptive gamma schedule / MH early-stop)
run as ONE fused device program (smc_tpu.smc.ensemble.make_ensemble_run),
software-pipelined across calls like bench.py. The reference's unit of
serving is one whole process invocation per dataset over a 30-core Ray
pool (SMC_methanation/SMC_methanation_main.py); here a full Bayesian
posterior is a sub-millisecond-amortized slice of one dispatch.

Prints one JSON line: posteriors/s (and weight-updates/s for
cross-reference with bench.py).
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from smc_tpu import SMCConfig
from smc_tpu.models.michaelis_menten import (generate_mm_pseudo_data,
                                             make_mm_data_loglik)
from smc_tpu.priors import Prior
from smc_tpu.smc.ensemble import make_ensemble_run
from smc_tpu.utils.compile_cache import enable_persistent_cache


def main(d_sets: int = 64, n: int = 2048, window_s: float = 10.0):
    enable_persistent_cache()
    ts, obs0, s0 = generate_mm_pseudo_data()
    obs0 = jnp.asarray(obs0)

    def noisy(key):
        ks = jax.random.split(key, d_sets)
        return jnp.stack([obs0 + 0.02 * jax.random.normal(k, obs0.shape)
                          for k in ks])

    # pallas_exact: under the ensemble's population vmap the custom_vmap
    # rule lowers all D populations' likelihoods to ONE batched kernel.
    loglik = make_mm_data_loglik(jnp.asarray(ts), jnp.asarray(s0),
                                 method="pallas_exact")
    prior = Prior.uniform([0.0, 0.0, 0.0], [10.0, 10.0, 10.0])
    cfg = SMCConfig(n_particles=n)
    run = make_ensemble_run(prior, loglik, d_sets, cfg)

    data = noisy(jax.random.key(100))
    out = run(jax.random.key(0), data)
    jax.block_until_ready(out.particles)
    assert (np.asarray(out.gamma) == 1.0).all()

    t0 = time.perf_counter()
    posteriors = 0
    updates = 0.0
    pending = []
    seed = 1
    while time.perf_counter() - t0 < window_s:
        s = run(jax.random.key(seed), data)
        pending.append((s.gamma, s.total_lik_evals))
        seed += 1
        if len(pending) > 1:
            g, e = jax.device_get(pending.pop(0))
            assert (np.asarray(g) == 1.0).all()
            posteriors += d_sets
            updates += float(np.sum(e))
    for q in pending:
        g, e = jax.device_get(q)
        assert (np.asarray(g) == 1.0).all()
        posteriors += d_sets
        updates += float(np.sum(e))
    dt = time.perf_counter() - t0

    p = np.asarray(out.particles)          # (D, N, 3)
    means = p.mean(axis=1)
    print(json.dumps({
        "metric": f"independent MM posteriors/s ({d_sets} datasets x "
                  f"{n} particles, one fused program)",
        "value": round(posteriors / dt, 2),
        "unit": "posteriors/s",
        "weight_updates_per_s": round(updates / dt, 1),
        "vmax_mean_range": [round(float(means[:, 0].min()), 3),
                            round(float(means[:, 0].max()), 3)],
        "km_mean_range": [round(float(means[:, 1].min()), 3),
                          round(float(means[:, 1].max()), 3)],
    }))


if __name__ == "__main__":
    main()
