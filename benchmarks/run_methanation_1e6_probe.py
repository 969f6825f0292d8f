"""North-star-scale probe: N = 1e6 methanation on ONE chip (block mode).

BASELINE.md's scale config is a 10^6-particle methanation posterior on a
v5e-16 pod. A full 1e6 run on one chip is ~5-6 h of compute (10x the
recorded 1e5 run, benchmarks/results/meth_1e5_r03.json); this probe
instead demonstrates the config RUNS on one chip and measures its
steady-state rate: the initial likelihood sweep plus the first full SMC
step (gamma search + resampling + adaptive mutation sweeps), every
device execution bounded to one 1e5-particle block
(run_smc(granularity="block") — a single 1e6-particle sweep would be a
~650 s execution, far over the tunnel worker's ~100 s ceiling,
docs/PERF.md "Execution-duration limit").

Reports per-block and per-sweep wall, particles/s, and the projected
full-posterior wall on 1 chip and v5e-16 (the collective-traffic model
in docs/PERF.md shows the DAE step adds zero collectives, so the pod
projection is the linear particle-axis split).

Launch detached:  setsid python benchmarks/run_methanation_1e6_probe.py \
                      > /tmp/meth_1e6_probe.out 2>&1 < /dev/null &
"""
import json
import os
import time

import jax

if os.environ.get("SMC_PROBE_CPU"):  # tiny-N script-logic smoke (conftest
    # pattern: env JAX_PLATFORMS is too late, sitecustomize already
    # registered the TPU plugin — must flip the config post-import)
    jax.config.update("jax_platforms", "cpu")

import numpy as np

from smc_tpu import SMCConfig
from smc_tpu.models.methanation import MethanationModel
from smc_tpu.smc.driver import (_run_step_by_blocks, init_state,
                                make_block_step_fns)
from smc_tpu.utils.compile_cache import enable_persistent_cache

N = int(os.environ.get("SMC_PROBE_N", 1_000_000))
BLOCK = int(os.environ.get("SMC_PROBE_BLOCK", 100_000))
CHUNK = int(os.environ.get("SMC_PROBE_CHUNK", 512))


def main():
    enable_persistent_cache()
    model = MethanationModel.default(n_conditions=30, particle_chunk=CHUNK)
    cfg = SMCConfig(n_particles=N, block_particles=BLOCK)

    t0 = time.perf_counter()
    state = init_state(jax.random.key(0), model, cfg)
    state.log_lik.block_until_ready()
    t_init = time.perf_counter() - t0
    n_fin = int(np.isfinite(np.asarray(state.log_lik)).sum())
    print(f"init sweep (10 blocked executions): {t_init:.1f}s  "
          f"finite log-liks: {n_fin}/{N}", flush=True)

    fns = make_block_step_fns(model, cfg)
    t1 = time.perf_counter()
    state = _run_step_by_blocks(state, cfg, fns)
    jax.block_until_ready(state.particles)
    t_step = time.perf_counter() - t1
    sweeps = int(state.n_mh)
    per_sweep = t_step / max(sweeps, 1)
    pps = N / per_sweep
    # flagship average ~2.5 sweeps/step, ~13 steps to gamma=1 (measured,
    # benchmarks/results/meth_1e5_r03.json)
    proj_1chip_h = 13 * 2.5 * per_sweep / 3600
    print(json.dumps({
        "n_particles": N, "block": BLOCK,
        "init_sweep_s": round(t_init, 1),
        "step1_s": round(t_step, 1), "step1_sweeps": sweeps,
        "per_sweep_s": round(per_sweep, 1),
        "particles_per_s": round(pps, 1),
        "gamma_after_step1": float(state.gamma),
        "ess": float(state.ess),
        "projected_full_run_1chip_h": round(proj_1chip_h, 2),
        "projected_full_run_v5e16_min": round(proj_1chip_h * 60 / 16, 1),
    }), flush=True)
    print("PROBE_1E6_DONE", flush=True)


if __name__ == "__main__":
    main()
