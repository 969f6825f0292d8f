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
              n_rank_draws: int = 127, mesh=None,
              granularity: str = "fused", verbose: bool = False
              ) -> Tuple[np.ndarray, np.ndarray, object]:
    """Run R replicate prior-draw -> simulate -> posterior cycles and return
    (ranks (R, d) int in [0, L], truths (R, d), final ensemble state).

    ``loglik_fn(theta (N, d), data_d)`` is the ensemble-style data-sliced
    likelihood; ``simulate_fn`` generates one replicate's data from one
    prior draw. L = ``n_rank_draws`` posterior draws are subsampled without
    replacement from each replicate's N final particles.

    ``granularity``: "fused" runs all R posteriors in one device program;
    "sweep" bounds each device execution to <= one ensemble mutation sweep
    (ensemble.run_ensemble_sweeps) — required on the tunneled single chip
    when the fused program would exceed the ~100 s execution ceiling
    (e.g. the 128x512 methanation SBC).
    """
    if n_rank_draws >= cfg.n_particles:
        raise ValueError("n_rank_draws must be < n_particles (thinning)")
    if granularity not in ("fused", "sweep"):
        raise ValueError(f"unknown granularity {granularity!r}")
    k_theta, k_sim, k_run, k_sub = jax.random.split(key, 4)
    thetas = prior.sample(k_theta, n_replicates, dtype=cfg.dtype)  # (R, d)
    data = jax.vmap(simulate_fn)(jax.random.split(k_sim, n_replicates),
                                 thetas)

    if granularity == "sweep":
        from smc_tpu.smc.ensemble import run_ensemble_sweeps
        states = run_ensemble_sweeps(k_run, prior, loglik_fn, data,
                                     n_replicates, cfg, verbose=verbose)
    else:
        run = make_ensemble_run(prior, loglik_fn, n_replicates, cfg,
                                mesh=mesh)
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


def _bin_expected(n_rank_draws: int, n_bins: int):
    """(edges, per-bin null probabilities) for binning uniform{0..L}.

    Ranks take the L+1 integer values 0..L. When (L+1) is not divisible by
    n_bins, equal-width bins hold UNEQUAL numbers of integers, so the null
    expectation must be per-bin (a flat R/n_bins would bias the statistic
    and flag valid samplers — e.g. --rank-draws 100 with 8 bins). Bins
    containing zero integers are dropped (their observed count is
    structurally 0)."""
    edges = np.linspace(0, n_rank_draws + 1, n_bins + 1)
    per_bin, _ = np.histogram(np.arange(n_rank_draws + 1), bins=edges)
    nz = per_bin > 0
    probs = per_bin[nz] / (n_rank_draws + 1)
    return edges, nz, probs


def rank_chi2(ranks: np.ndarray, n_rank_draws: int, n_bins: int = 8
              ) -> np.ndarray:
    """Per-dimension chi-square statistic of the SBC rank histogram against
    uniform{0..L}, with per-bin expected counts from the actual number of
    integers each bin covers. Under the null each statistic
    ~ chi2(df) with df = (number of non-empty bins) - 1 (= n_bins - 1
    whenever n_bins <= L+1)."""
    ranks = np.asarray(ranks)
    R, d = ranks.shape
    edges, nz, probs = _bin_expected(n_rank_draws, n_bins)
    expected = R * probs
    stats = np.empty(d)
    for j in range(d):
        counts, _ = np.histogram(ranks[:, j], bins=edges)
        stats[j] = np.sum((counts[nz] - expected) ** 2 / expected)
    return stats


def rank_chi2_pvalues(ranks: np.ndarray, n_rank_draws: int,
                      n_bins: int = 8) -> np.ndarray:
    """Per-dimension chi-square p-values (requires scipy)."""
    from scipy.stats import chi2
    stats = rank_chi2(ranks, n_rank_draws, n_bins)
    _, nz, _ = _bin_expected(n_rank_draws, n_bins)
    return chi2.sf(stats, df=max(int(nz.sum()) - 1, 1))


# ---------------------------------------------------------------------------
# Canonical SBC problems (shared by the CLI `smc-tpu sbc`, the on-chip
# recording script benchmarks/sbc_tpu.py, and tests/test_sbc.py — one
# definition of "calibrate the sampler on this model family").
# ---------------------------------------------------------------------------

def mm_sbc_problem(method: str = "exact", n_datasets: int = 5):
    """Michaelis-Menten SBC problem.

    Returns ``(prior, simulate_fn, loglik_fn, param_names)`` for
    :func:`sbc_ranks`. The simulator uses the closed-form Lambert-W
    trajectory (identical math to the likelihood), so rank deviations are
    attributable to the SAMPLER, not forward-model mismatch.
    """
    from smc_tpu.models.michaelis_menten import make_mm_data_loglik
    from smc_tpu.ops.lambertw import lambertw
    ts = jnp.linspace(0.0, 10.0, 40)
    s0 = jnp.asarray([2.0, 1.0, 4.0, 0.5, 3.0][:n_datasets], jnp.float32)
    prior = Prior.uniform([0.5, 0.1, 0.01], [2.0, 1.5, 0.05])
    loglik = make_mm_data_loglik(ts, s0, method=method)

    def simulate(key, theta):
        vmax, km, sigma = theta[0], theta[1], theta[2]
        km_safe = jnp.maximum(km, 1e-8)
        logz = (jnp.log(s0 / km_safe)[None]
                + (s0[None] - vmax * ts[:, None]) / km_safe)   # (T, n_ds)
        S = km_safe * lambertw(jnp.exp(jnp.clip(logz, -60.0, 60.0)))
        P_true = (s0[None] - S).T                              # (n_ds, T)
        return P_true + sigma * jax.random.normal(key, P_true.shape)

    return prior, simulate, loglik, ("Vmax", "Km", "sigma")


def methanation_sbc_problem(n_conditions: int = 2, nx: int = 11,
                            n_steps: int = 6, growth: float = 1.6,
                            particle_chunk: int = 64, est_idx=(0, 8),
                            reference_prior: bool = False):
    """Methanation SBC problem (flagship DAE family).

    Defaults give the cheap suite configuration: estimate (Af, sigma) on a
    coarse reactor grid with a narrow uniform prior. The POWERED
    configuration (round-3 verdict item 3) passes ``est_idx`` =
    models.methanation.EST_DEFAULT (Af, Eaf, Ar, Ear, sigma — putting the
    Ar/Ear ridge INSIDE the calibration test), ``nx=51`` and
    ``reference_prior=True`` (the reference's use_params +- use_params*k
    bounds, methanation_set_conditon.py:61-70). Returns
    ``(prior, simulate_fn, loglik_fn, names)``.
    """
    import dataclasses

    from smc_tpu.models.methanation import (KIN_TRUE, SIGMA_TRUE,
                                            MethanationModel,
                                            methanation_prior)

    est_idx = tuple(est_idx)
    kw = {}
    if n_steps is not None:
        kw["n_steps"] = n_steps
    if growth is not None:
        kw["growth"] = growth
    model = MethanationModel.default(
        n_conditions=n_conditions, nx=nx, est_idx=est_idx,
        particle_chunk=particle_chunk, noise=False, **kw)
    if reference_prior:
        prior = methanation_prior(est_idx)
    else:
        if est_idx != (0, 8):
            raise ValueError("narrow default prior only covers (Af, sigma);"
                             " pass reference_prior=True for other subsets")
        prior = Prior.uniform([8.0, 3.0], [20.0, 8.0])   # Af, sigma
    kin_rest = jnp.asarray(KIN_TRUE, jnp.float32)
    names = tuple(model.param_names)

    def simulate(key, theta):
        kin = kin_rest
        sigma = jnp.asarray(SIGMA_TRUE, jnp.float32)
        for j, i in enumerate(est_idx):
            if i == 8:
                sigma = theta[j]
            else:
                kin = kin.at[i].set(theta[j])
        flows = model.simulate_flows(kin)            # (5, n_cond)
        return flows + sigma * jax.random.normal(key, flows.shape)

    def loglik(theta, obs):
        return dataclasses.replace(model, obs=obs).log_likelihood(theta)

    return prior, simulate, loglik, names
