"""Simulation-based calibration of the SMC sampler (smc_tpu/smc/sbc.py).

Converts the reference's only validation mechanism — "the posterior
histogram brackets the truth vline" (methanation_functions.py:194) — into
a statistical calibration proof: over replicate prior-draw -> simulate ->
posterior cycles, the rank of the truth among posterior draws must be
uniform (Talts et al. 2018). The replicates run as ONE fused ensemble
program, which is what makes this affordable enough for the default suite.
"""
import jax
import jax.numpy as jnp
import numpy as np

from smc_tpu.config import SMCConfig
from smc_tpu.smc.sbc import mm_sbc_problem, rank_chi2_pvalues, sbc_ranks

L = 63  # posterior rank draws per replicate


def _mm_setup():
    prior, simulate, loglik, _ = mm_sbc_problem(n_datasets=3)
    return prior, simulate, loglik


def test_sbc_mm_ranks_uniform():
    """64 replicate MM posteriors: per-dimension chi-square on the rank
    histogram must not reject uniformity (alpha = 1e-3; under the null this
    flakes ~0.3% per dimension, and a biased sampler fails by orders of
    magnitude — see the power check below)."""
    prior, simulate, loglik = _mm_setup()
    cfg = SMCConfig(n_particles=512)
    ranks, thetas, states = sbc_ranks(
        jax.random.key(0), prior, simulate, loglik,
        n_replicates=64, cfg=cfg, n_rank_draws=L)
    assert ranks.shape == (64, 3)
    pvals = rank_chi2_pvalues(ranks, L)
    assert (pvals > 1e-3).all(), f"SBC uniformity rejected: p={pvals}"

    # Power check: the SAME posteriors judged against a truth shifted by
    # ~1 posterior sd must fail decisively — i.e. the test statistic can
    # actually see miscalibration at the scale that matters.
    post_sd = np.asarray(states.particles).std(1).mean(0)      # (d,)
    shifted = jnp.asarray(thetas + post_sd[None, :])

    def one_rank(k, particles, truth):
        idx = jax.random.choice(k, cfg.n_particles, (L,), replace=False)
        return jnp.sum((particles[idx] < truth[None, :]).astype(jnp.int32),
                       axis=0)

    bad_ranks = np.asarray(jax.vmap(one_rank)(
        jax.random.split(jax.random.key(7), 64), states.particles, shifted))
    bad_p = rank_chi2_pvalues(bad_ranks, L)
    assert (bad_p < 1e-4).all(), f"power check: shifted truth passed {bad_p}"


def test_sbc_methanation_small():
    """Small methanation SBC (flagship model family in the calibration
    loop): 12 replicates x 64 particles on a coarse grid, estimating
    (Af, sigma). Too few replicates for a chi-square, so the assertion is
    on the mean normalized rank: under calibration it is 0.5 with
    sd = 1/sqrt(12 R); a one-sided-collapsed posterior (the failure mode
    ridge-identifiability arguments worry about) sits near 0 or 1."""
    from smc_tpu.smc.sbc import methanation_sbc_problem

    R = 12
    prior, simulate, loglik, _ = methanation_sbc_problem()
    cfg = SMCConfig(n_particles=64, mh_steps=3, mh_steps_final=5)
    ranks, _, _ = sbc_ranks(jax.random.key(1), prior, simulate, loglik,
                            n_replicates=R, cfg=cfg, n_rank_draws=L)
    mean_norm = ranks.mean(0) / L
    sd = 1.0 / np.sqrt(12.0 * R)
    assert (np.abs(mean_norm - 0.5) < 4.0 * sd).all(), \
        f"mean normalized ranks {mean_norm} outside 0.5 +/- {4 * sd:.3f}"


def test_rank_chi2_unequal_integer_bins():
    """(L+1) not divisible by n_bins: per-bin expected counts must follow
    the actual number of integers each bin covers (ADVICE r3: a flat
    R/n_bins expectation biases the statistic for e.g. --rank-draws 100
    and can fail a perfectly calibrated sampler)."""
    from smc_tpu.smc.sbc import rank_chi2
    L, reps = 100, 4  # 101 rank values over 8 bins: 12/13/12/13/...
    exact_uniform = np.tile(np.arange(L + 1), reps)[:, None]
    stats = rank_chi2(exact_uniform, L, n_bins=8)
    # exactly proportional counts -> statistic exactly 0 under the
    # corrected expectation (the old flat expectation gives ~1.9)
    assert stats[0] < 1e-12

    # equal-coverage case unchanged: 64 values over 8 bins of 8
    L2 = 63
    stats2 = rank_chi2(np.tile(np.arange(L2 + 1), reps)[:, None], L2)
    assert stats2[0] < 1e-12


def test_rank_chi2_pvalues_df_tracks_nonempty_bins():
    from smc_tpu.smc.sbc import rank_chi2_pvalues
    rng = np.random.default_rng(0)
    ranks = rng.integers(0, 4, size=(400, 1))  # L=3: only 4 rank values
    # 8 requested bins but only 4 can be non-empty -> df=3, p well-defined
    p = rank_chi2_pvalues(ranks, 3, n_bins=8)
    assert 0.0 <= p[0] <= 1.0
