"""Powered methanation SBC on the real chip (round-3 verdict item 3).

Round 3's methanation SBC was 12 replicates x 64 particles estimating only
(Af, sigma) — blind to the Ar/Ear ridge that docs/PARITY.md's
identifiability argument worries about. This runs the POWERED config:

- R = 128 replicates x N = 512 particles (>= the verdict's floor),
- nx = 51 (the reference's full reactor grid,
  methanation_set_conditon.py:17), 30 experimental conditions,
- the default 5-parameter estimated set (Af, Eaf, Ar, Ear, sigma) under
  the reference's own prior bounds — the ridge pair is INSIDE the test,
- per-dimension chi-square on the rank histograms (the MM-grade harness).

Device-execution safety: the fused whole-ensemble program would be tens
of minutes of device time (far over the tunnel worker's ~100 s ceiling),
so this uses the sweep-granularity ensemble engine
(ensemble.run_ensemble_sweeps): every execution <= one ensemble mutation
sweep (~R*N/1500 s). Ensemble states checkpoint each step; rerunning the
script resumes.

Launch detached:
    setsid python benchmarks/sbc_methanation_full.py \
        > /tmp/sbc_full.out 2>&1 < /dev/null &
"""
import json
import os
import time

import jax

if os.environ.get("SMC_SBC_CPU"):  # tiny smoke (conftest pattern)
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

R = int(os.environ.get("SMC_SBC_R", 128))
N = int(os.environ.get("SMC_SBC_N", 512))
NXG = int(os.environ.get("SMC_SBC_NX", 51))
NCOND = int(os.environ.get("SMC_SBC_COND", 30))
# Per-REPLICATE likelihood chunk. The ensemble program vmaps the march
# over all R replicates, so device working-set scales with R*chunk*30
# lanes: chunk 512 materializes f32[128,7,7,51,15360] Jacobian blocks =
# 19.7 GB and OOMs the 16 GB chip (measured 2026-08-20, AOT PJRT error).
# chunk 16 -> 61,440 lanes in flight (4x the flagship march's 15,360 —
# VPU still saturated) at ~3.7 GB.
CHUNK = int(os.environ.get("SMC_SBC_CHUNK", 16))
LDRAWS = int(os.environ.get("SMC_SBC_L", 127))
# Checkpoint lives in the repo (not /tmp) so ~75 min of chip time
# survives a VM restart (the round-4 1e6 first attempt lost its /tmp
# checkpoint exactly that way).
CKPT = os.environ.get(
    "SMC_SBC_CKPT",
    os.path.join(os.path.dirname(os.path.abspath(__file__)),
                 "results", "run_sbc", "sbc_full_ck.smcd"))
OUT = os.path.join(os.path.dirname(__file__), "results",
                   os.environ.get("SMC_SBC_OUT",
                                  "sbc_methanation_full_r04.json"))


def main():
    from smc_tpu.config import SMCConfig
    from smc_tpu.io.checkpoint import load_state, save_state_chunked
    from smc_tpu.models.methanation import EST_DEFAULT
    from smc_tpu.smc.ensemble import run_ensemble_sweeps
    from smc_tpu.smc.sbc import (methanation_sbc_problem, rank_chi2,
                                 rank_chi2_pvalues)
    from smc_tpu.utils.compile_cache import enable_persistent_cache
    from smc_tpu.utils.resilient import checkpoint_exists

    enable_persistent_cache()
    coarse = bool(os.environ.get("SMC_SBC_COARSE"))  # CPU smoke only
    prior, simulate, loglik, names = methanation_sbc_problem(
        n_conditions=NCOND, nx=NXG,
        n_steps=6 if coarse else None, growth=1.6 if coarse else None,
        particle_chunk=min(CHUNK, N), est_idx=EST_DEFAULT,
        reference_prior=True)
    cfg = SMCConfig(n_particles=N)

    # sbc_ranks prologue, inlined so the ensemble run can checkpoint/resume
    key = jax.random.key(int(os.environ.get("SMC_SBC_SEED", 0)))
    k_theta, k_sim, k_run, k_sub = jax.random.split(key, 4)
    thetas = prior.sample(k_theta, R, dtype=cfg.dtype)          # (R, d)
    data = jax.vmap(simulate)(jax.random.split(k_sim, R), thetas)

    states = None
    if checkpoint_exists(CKPT):
        states = load_state(CKPT)
        print(f"resuming: {int(np.sum(np.asarray(states.gamma) < 1.0))}/"
              f"{R} replicates still tempering", flush=True)

    t0 = time.perf_counter()

    def cb(ss):
        save_state_chunked(CKPT, ss)

    attempts = 4
    while True:
        try:
            states = run_ensemble_sweeps(
                k_run, prior, loglik, data, R, cfg, verbose=True,
                callback=cb, states=states,
                stop_file=os.path.join(os.path.dirname(CKPT), "STOP"))
            break
        except (KeyboardInterrupt, SystemExit):
            raise
        except Exception as e:  # tunnel worker crash: reload + continue
            attempts -= 1
            if attempts < 0:
                raise
            print(f"retry after {type(e).__name__}: {e}", flush=True)
            states = load_state(CKPT) if checkpoint_exists(CKPT) else None
            time.sleep(60)
    wall = time.perf_counter() - t0

    n_unfinished = int(np.sum(np.asarray(states.gamma) < 1.0))
    if n_unfinished:
        print(f"WARNING: {n_unfinished}/{R} replicates hit max_steps "
              f"before gamma=1", flush=True)

    def one_rank(k, particles, truth):
        idx = jax.random.choice(k, N, (LDRAWS,), replace=False)
        sub = particles[idx]
        return jnp.sum((sub < truth[None, :]).astype(jnp.int32), axis=0)

    ranks = np.asarray(jax.vmap(one_rank)(
        jax.random.split(k_sub, R), states.particles, thetas))
    stats = rank_chi2(ranks, LDRAWS)
    pvals = rank_chi2_pvalues(ranks, LDRAWS)
    mean_norm = ranks.mean(0) / LDRAWS
    z = (mean_norm - 0.5) * np.sqrt(12.0 * R)
    rec = {
        "replicates": R, "particles": N, "nx": NXG, "conditions": NCOND,
        "est_params": list(names), "rank_draws": LDRAWS,
        "wall_s": round(wall, 1), "unfinished": n_unfinished,
        "steps_mean": float(np.asarray(states.step).mean()),
        "mean_norm_rank": [round(float(v), 4) for v in mean_norm],
        "mean_rank_z": [round(float(v), 2) for v in z],
        "chi2_df7": [round(float(v), 2) for v in stats],
        "p_values": [float(f"{v:.3g}") for v in pvals],
        "calibrated_alpha_1e3": bool((pvals > 1e-3).all()),
    }
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    json.dump(rec, open(OUT, "w"), indent=1)
    print(json.dumps(rec), flush=True)
    print("SBC_FULL_DONE", flush=True)


if __name__ == "__main__":
    main()
