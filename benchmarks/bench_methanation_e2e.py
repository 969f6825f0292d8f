"""End-to-end methanation posterior at the reference default scale.

Runs the FULL likelihood-tempered SMC (N=1000 particles x 30 conditions,
the reference's default: methanation_set_conditon.py:107-108) as one fused
device program (prior draw + init sweep + all tempering steps) and prints
warm wall-clock, throughput, and posterior moments. The reference runs
this workload as one Ray task per particle over 30 CPU cores, each task
30 sequential SUNDIALS IDA solves; its saved posterior for this config is
the BASELINE.md anchor (Af 31.69+-5.95, Eaf 56639+-904, sigma 5.44+-0.46).

First-ever invocation compiles the whole-run program (~minutes on the
one-core host); the persistent XLA cache makes repeat invocations skip
straight to compute.
"""
import json
import time

import jax
import numpy as np

from smc_tpu.utils.compile_cache import enable_persistent_cache


def main(n: int = 1000):
    enable_persistent_cache()
    from smc_tpu import SMCConfig
    from smc_tpu.models.methanation import MethanationModel, KIN_TRUE, \
        SIGMA_TRUE
    from smc_tpu.smc.driver import make_full_run_on_device

    model = MethanationModel.default(n_conditions=30, particle_chunk=128,
                                     noise=True)
    cfg = SMCConfig(n_particles=n)
    full = make_full_run_on_device(model, cfg)

    t0 = time.perf_counter()
    s = full(jax.random.key(0))
    jax.block_until_ready(s.particles)
    wall_cold = time.perf_counter() - t0

    t0 = time.perf_counter()
    s = full(jax.random.key(1))
    jax.block_until_ready(s.particles)
    wall = time.perf_counter() - t0

    p = np.asarray(s.particles)
    truth = [KIN_TRUE[i] for i in model.est_idx if i < 8]
    if 8 in model.est_idx:
        truth.append(SIGMA_TRUE)
    print(json.dumps({
        "metric": "methanation full posterior wall-clock "
                  "(N=1000 x 30 cond., fused run)",
        "value": round(wall, 2),
        "unit": "s",
        "wall_incl_compile_s": round(wall_cold, 2),
        "steps": int(s.step),
        "gamma": float(s.gamma),
        "weight_updates_per_s": round(float(s.total_lik_evals) / wall, 1),
        "dae_solves_per_s": round(float(s.total_lik_evals) * 30 / wall, 1),
        "param_names": list(model.param_names),
        "posterior_mean": [round(float(x), 4) for x in p.mean(0)],
        "posterior_std": [round(float(x), 4) for x in p.std(0)],
        "truth": truth,
    }))


if __name__ == "__main__":
    main()
