"""End-to-end statistical parity with the reference algorithm.

Runs the independent sequential NumPy implementation of the reference's SMC
(tests/oracle_smc.py) and the TPU implementation on the SAME data at equal
particle counts, and requires posterior moments to agree within Monte Carlo
tolerance (BASELINE.md: "Posterior moments at equal particle counts within
Monte Carlo tolerance of reference NumPy/SciPy implementation"). RNG streams
necessarily differ (global-seed NumPy vs counter-based threefry), so the
comparison is distributional, pooled over independent replicas of the TPU
sampler to estimate the MC spread.
"""
import jax
import numpy as np
import pytest

from smc_tpu import SMCConfig, run_smc_on_device
from smc_tpu.models.michaelis_menten import (MichaelisMentenModel,
                                             generate_mm_pseudo_data)
from tests.oracle_smc import run_reference_smc


@pytest.mark.parametrize("n_particle", [256])
def test_mm_posterior_moments_match_reference_algorithm(n_particle):
    ts, obs, s0 = generate_mm_pseudo_data()

    # Reference-algorithm posterior (sequential NumPy/SciPy), 2 seeds.
    ref_means, ref_stds = [], []
    for seed in (0, 1):
        p_ref, gamma = run_reference_smc(obs, s0, ts, n_particle=n_particle,
                                         seed=seed)
        assert gamma == 1.0
        ref_means.append(p_ref.mean(0))
        ref_stds.append(p_ref.std(0))
    ref_mean = np.mean(ref_means, axis=0)
    ref_std = np.mean(ref_stds, axis=0)

    # TPU posterior, 3 replicas.
    model = MichaelisMentenModel.default(
        obs=None, method="exact")
    # use identical data
    import jax.numpy as jnp
    import dataclasses
    model = dataclasses.replace(model, obs=jnp.asarray(obs),
                                s0=jnp.asarray(s0), ts=jnp.asarray(ts))
    cfg = SMCConfig(n_particles=n_particle)
    tpu_means, tpu_stds = [], []
    for seed in range(3):
        state = run_smc_on_device(model, cfg, jax.random.key(seed))
        assert float(state.gamma) == 1.0
        p = np.asarray(state.particles)
        tpu_means.append(p.mean(0))
        tpu_stds.append(p.std(0))
    tpu_mean = np.mean(tpu_means, axis=0)
    tpu_std = np.mean(tpu_stds, axis=0)

    # MC tolerance: posterior-mean SE ~= std/sqrt(ESS); SMC particles are
    # correlated, so allow a generous multiple.
    se = ref_std / np.sqrt(n_particle) * 6 + 1e-4
    np.testing.assert_allclose(tpu_mean, ref_mean, atol=se.max(), rtol=0.05)
    # posterior spreads within 40% of each other
    np.testing.assert_allclose(tpu_std, ref_std, rtol=0.4)
