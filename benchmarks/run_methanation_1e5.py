"""North-star-scale methanation posterior on ONE chip: N = 1e5 particles.

BASELINE.md's scale config is a 10^6-particle methanation posterior on a
v5e-16 pod; the largest single-chip run recorded through round 2 was
N = 10,000. This runs the largest config that fits a session on the one
available chip — 1e5 particles x 30 conditions, the reference's full
problem, 100x its default particle count — and records wall clock,
tempering path, posterior moments, and weight-update throughput for
docs/PERF.md (round-2 verdict item 2). 1e6 on 16 chips is then a linear
particle-axis projection (the dryrun + measured-traffic scaling model
covers the collectives).

Crash-resilient: checkpoints every SMC step (~2.4 MB at this N) and
resumes from /tmp/meth_1e5.smck — the axon tunnel's TPU worker can
restart mid-session (observed once at this scale), and a restarted
worker only costs the in-flight step. Launch detached, auto-retry:

    setsid bash -c 'for i in 1 2 3 4 5; do \
        python benchmarks/run_methanation_1e5.py && break; sleep 120; \
    done' > /tmp/meth_1e5.out 2>&1 &
"""
import json
import os
import time

import jax
import numpy as np

from smc_tpu import SMCConfig, run_smc
from smc_tpu.io.checkpoint import load_state, save_state
from smc_tpu.models.methanation import KIN_TRUE, MethanationModel, SIGMA_TRUE
from smc_tpu.utils.compile_cache import enable_persistent_cache

N = 100_000
# .npz explicitly: np.savez appends it anyway, and the resume check below
# must test the path that actually lands on disk.
CKPT = "/tmp/meth_1e5.smck.npz"
WALL = "/tmp/meth_1e5_wall.json"


def main():
    enable_persistent_cache()
    model = MethanationModel.default(n_conditions=30, particle_chunk=128)
    cfg = SMCConfig(n_particles=N)

    state = None
    prev_wall = 0.0
    if os.path.exists(CKPT):
        state = load_state(CKPT)
        if os.path.exists(WALL):
            prev_wall = json.load(open(WALL))["wall_s"]
        print(f"resuming from step {int(state.step)} "
              f"gamma={float(state.gamma):.6f} (+{prev_wall:.0f}s prior)",
              flush=True)

    t0 = time.perf_counter()

    def ckpt_cb(st):
        save_state(CKPT, st)
        json.dump({"wall_s": prev_wall + time.perf_counter() - t0},
                  open(WALL, "w"))

    # granularity="sweep": the fused step at this N is a single 100-160 s
    # XLA execution, which the tunnel's TPU worker does not survive
    # (observed: >=5 consecutive worker crashes); one-sweep executions
    # (~65 s) do. Same math, host-observed adaptive controller.
    st = run_smc(model, cfg, jax.random.key(0), verbose=True,
                 state=state, callback=ckpt_cb, granularity="sweep")
    wall = prev_wall + time.perf_counter() - t0
    p = np.asarray(st.particles)
    truth = np.asarray(list(KIN_TRUE) + [SIGMA_TRUE])[list(model.est_idx)]
    # param_names is already the est_idx subset (methanation.py:891-892).
    names = list(model.param_names)
    print(json.dumps({
        "n_particles": N, "n_conditions": 30,
        "gamma": float(st.gamma), "steps": int(st.step),
        "wall_s": round(wall, 1),
        "total_lik_evals": float(st.total_lik_evals),
        "weight_updates_per_s": round(float(st.total_lik_evals) / wall, 1),
        "dae_solves_per_s": round(30 * float(st.total_lik_evals) / wall, 1),
        "params": names,
        "posterior_mean": [float(f"{v:.6g}") for v in p.mean(0)],
        "posterior_std": [float(f"{v:.6g}") for v in p.std(0)],
        "truth": truth.tolist(),
        "mean_within_1sd": bool(
            (np.abs(p.mean(0) - truth) < np.maximum(p.std(0), 1e-9)).all()),
    }), flush=True)
    np.savez("/tmp/meth_1e5_posterior.npz", particles=p,
             gamma=float(st.gamma))


if __name__ == "__main__":
    main()
