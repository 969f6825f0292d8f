"""Compacted continuation of the powered methanation SBC.

The 128-replicate ensemble tempers replicates at wildly different rates
(sharp-likelihood prior draws climb the gamma ladder in ~1e-6 steps), and
the SPMD freeze semantics mean every ensemble sweep still pays for ALL
128 replicates: by step 8 of the round-4 run, 93/128 were frozen at
gamma=1 while each remaining sweep burned 73% of its device time on
frozen lanes. This script resumes ONLY the still-tempering replicates as
a smaller ensemble (identical per-replicate state, priors, data, and
per-replicate PRNG keys from the checkpoint — each replicate's posterior
is unchanged, so the SBC rank statistics are unbiased), then merges the
finished actives back with the frozen replicates and computes the
rank/chi-square record exactly as benchmarks/sbc_methanation_full.py
would have.

Launch detached after stopping the full-ensemble run:
    setsid python benchmarks/sbc_methanation_cont.py \
        > benchmarks/results/sbc_cont_r04.log 2>&1 < /dev/null &

CPU smoke (merge/rank plumbing only; touches STOP first so no march):
    SMC_SBC_CPU=1 SMC_SBC_CONT_FAKE_DATA=1 \
        python benchmarks/sbc_methanation_cont.py
"""
import json
import os
import time

import jax

if os.environ.get("SMC_SBC_CPU"):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

R = int(os.environ.get("SMC_SBC_R", 128))
N = int(os.environ.get("SMC_SBC_N", 512))
NXG = int(os.environ.get("SMC_SBC_NX", 51))
NCOND = int(os.environ.get("SMC_SBC_COND", 30))
CHUNK = int(os.environ.get("SMC_SBC_CHUNK", 16))
LDRAWS = int(os.environ.get("SMC_SBC_L", 127))
_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                    "results", "run_sbc")
CKPT = os.environ.get("SMC_SBC_CKPT",
                      os.path.join(_DIR, "sbc_full_ck.smcd"))
CKPT2 = os.path.join(_DIR, "sbc_cont_ck.smcd")
STOP = os.path.join(_DIR, "STOP")
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "results",
                   os.environ.get("SMC_SBC_OUT",
                                  "sbc_methanation_full_r04.json"))


def _take(state, idx):
    from smc_tpu.smc.ensemble import take_datasets
    return take_datasets(state, idx)


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
    coarse = bool(os.environ.get("SMC_SBC_COARSE"))
    prior, simulate, loglik, names = methanation_sbc_problem(
        n_conditions=NCOND, nx=NXG,
        n_steps=6 if coarse else None, growth=1.6 if coarse else None,
        particle_chunk=min(CHUNK, N), est_idx=EST_DEFAULT,
        reference_prior=True)
    cfg = SMCConfig(n_particles=N)

    # Identical derivation to sbc_methanation_full.py: thetas/data/rank
    # keys are pure functions of the seed, so the continuation sees
    # byte-identical data for every replicate.
    key = jax.random.key(int(os.environ.get("SMC_SBC_SEED", 0)))
    k_theta, k_sim, k_run, k_sub = jax.random.split(key, 4)
    thetas = prior.sample(k_theta, R, dtype=cfg.dtype)          # (R, d)
    if os.environ.get("SMC_SBC_CONT_FAKE_DATA"):  # CPU plumbing smoke
        data = jnp.zeros((R, 5, NCOND), cfg.dtype)
    else:
        data = jax.vmap(simulate)(jax.random.split(k_sim, R), thetas)

    base = load_state(CKPT)
    g0 = np.asarray(base.gamma)
    act_idx = np.nonzero(g0 < 1.0)[0]
    print(f"continuation: {len(act_idx)}/{R} replicates still tempering "
          f"(min gamma {g0.min():.3e}, base steps "
          f"{int(np.asarray(base.step).max())})", flush=True)

    # The rank statistics need only (particles, gamma, step) per
    # replicate — merge those as host arrays at the original indices.
    m_particles = np.array(base.particles)   # writable copies (the
    m_gamma = np.array(g0)                   # .smcd loader hands back
    m_step = np.array(base.step)             # read-only mmap views)
    # Persist the active-index map next to CKPT2 and validate it on
    # resume: a base checkpoint that advanced since CKPT2 was written
    # (or a redirected SMC_SBC_CKPT) with the SAME active count would
    # otherwise pair replicates with the wrong datasets silently (a
    # different count fails loudly via vmap shape mismatch).
    act_idx_file = CKPT2 + ".act_idx.json"
    if len(act_idx):
        if checkpoint_exists(CKPT2):
            try:
                saved_idx = json.load(open(act_idx_file))
            except OSError:
                raise SystemExit(
                    f"{CKPT2} exists but {act_idx_file} is missing — "
                    "cannot verify replicate/dataset pairing; delete the "
                    "compacted checkpoint to restart the continuation")
            if saved_idx != act_idx.tolist():
                raise SystemExit(
                    f"active-set mismatch: {act_idx_file} was written for "
                    f"indices {saved_idx} but the current base checkpoint "
                    f"gives {act_idx.tolist()} — the base advanced or "
                    "SMC_SBC_CKPT points elsewhere; delete the compacted "
                    "checkpoint to restart the continuation")
            act = load_state(CKPT2)
            print(f"resuming compacted ensemble: "
                  f"{int(np.sum(np.asarray(act.gamma) < 1.0))}"
                  f"/{len(act_idx)} active", flush=True)
        else:
            json.dump(act_idx.tolist(), open(act_idx_file, "w"))
            act = _take(base, act_idx)
        data_act = jnp.asarray(np.asarray(data)[act_idx])

        t0 = time.perf_counter()
        attempts = 4
        while True:
            try:
                act = run_ensemble_sweeps(k_run, prior, loglik, data_act,
                                          len(act_idx), cfg, verbose=True,
                                          callback=lambda s:
                                          save_state_chunked(CKPT2, s),
                                          states=act, stop_file=STOP)
                break
            except (KeyboardInterrupt, SystemExit):
                raise
            except Exception as e:  # tunnel worker crash: reload + retry
                attempts -= 1
                if attempts < 0:
                    raise
                print(f"retry after {type(e).__name__}: {e}", flush=True)
                act = (load_state(CKPT2) if checkpoint_exists(CKPT2)
                       else _take(base, act_idx))
                time.sleep(60)
        print(f"compacted march: {time.perf_counter() - t0:.1f}s",
              flush=True)
        m_particles[act_idx] = np.asarray(act.particles)
        m_gamma[act_idx] = np.asarray(act.gamma)
        m_step[act_idx] = np.asarray(act.step)

    n_unfinished = int((m_gamma < 1.0).sum())
    if n_unfinished:
        print(f"WARNING: {n_unfinished}/{R} replicates still unfinished",
              flush=True)

    particles = jnp.asarray(m_particles)                    # (R, N, d)

    def one_rank(k, parts, truth):
        idx = jax.random.choice(k, N, (LDRAWS,), replace=False)
        sub = parts[idx]
        return jnp.sum((sub < truth[None, :]).astype(jnp.int32), axis=0)

    ranks = np.asarray(jax.vmap(one_rank)(
        jax.random.split(k_sub, R), particles, thetas))
    stats = rank_chi2(ranks, LDRAWS)
    pvals = rank_chi2_pvalues(ranks, LDRAWS)
    mean_norm = ranks.mean(0) / LDRAWS
    z = (mean_norm - 0.5) * np.sqrt(12.0 * R)
    rec = {
        "replicates": R, "particles": N, "nx": NXG, "conditions": NCOND,
        "est_params": list(names), "rank_draws": LDRAWS,
        "unfinished": n_unfinished,
        "steps_mean": float(m_step.mean()),
        "compacted_continuation": {
            "resumed_active": int(len(act_idx)),
            "from_base_step": int(np.asarray(base.step).max())},
        "mean_norm_rank": [round(float(v), 4) for v in mean_norm],
        "mean_rank_z": [round(float(v), 2) for v in z],
        "chi2_df7": [round(float(v), 2) for v in stats],
        "p_values": [float(f"{v:.3g}") for v in pvals],
        "calibrated_alpha_1e3": bool((pvals > 1e-3).all()),
    }
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    json.dump(rec, open(OUT, "w"), indent=1)
    print(json.dumps(rec), flush=True)
    print("SBC_FULL_DONE" if not n_unfinished else "SBC_CONT_PARTIAL",
          flush=True)


if __name__ == "__main__":
    main()
