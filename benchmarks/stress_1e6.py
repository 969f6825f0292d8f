"""Stress config: 10^6-particle Michaelis-Menten tempered SMC on one chip
(BASELINE.json config 4; on a v5e-16 pod the particle axis shards over the
mesh via smc_tpu.parallel — this script runs whatever devices are visible).
Pass a particle count as argv[1] to stress other scales (e.g. 10000000).

Prints one JSON line with wall-clock to the ESS-converged posterior and
weight-update throughput.
"""
import json
import sys
import time

import jax
import numpy as np

from smc_tpu import SMCConfig
from smc_tpu.models.michaelis_menten import MichaelisMentenModel
from smc_tpu.parallel.mesh import make_mesh, particle_sharding
from smc_tpu.smc.driver import make_full_run_on_device


def main(n: int = 1_000_000):
    from smc_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    model = MichaelisMentenModel.default(method="pallas_exact")
    cfg = SMCConfig(n_particles=n)
    key = jax.random.key(0)

    n_dev = len(jax.devices())
    psh = particle_sharding(make_mesh(n_dev)) if n_dev > 1 else None

    # Deployment shape (same as bench.py): the whole run — prior draw,
    # init sweep, all tempering steps — is ONE jitted program dispatch.
    full = make_full_run_on_device(model, cfg, psharding=psh)
    t0 = time.perf_counter()
    final = full(key)
    jax.block_until_ready(final.particles)
    wall_cold = time.perf_counter() - t0
    # Warm wall: compile amortized (persistent cache + in-process jit) —
    # the deployment-relevant number for repeat runs.
    t0 = time.perf_counter()
    final = full(jax.random.key(1))
    jax.block_until_ready(final.particles)
    wall = time.perf_counter() - t0
    p = np.asarray(final.particles)
    updates = float(final.total_lik_evals)
    print(json.dumps({
        "metric": f"{n:.0e}-particle MM SMC wall-clock ({n_dev} device(s))",
        "value": round(wall, 2),
        "unit": "s",
        "wall_incl_compile_s": round(wall_cold, 2),
        "steps": int(final.step),
        "weight_updates_per_s": round(updates / wall, 1),
        "posterior_mean": [round(float(x), 5) for x in p.mean(0)],
        "posterior_std": [round(float(x), 6) for x in p.std(0)],
    }))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000)
