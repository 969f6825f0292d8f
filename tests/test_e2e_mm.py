"""End-to-end Michaelis-Menten posterior test.

Mirrors the reference's de-facto validation (SURVEY.md §4): generate pseudo
data from known truth (Vmax=1.2, Km=0.5, noise 0.02 —
Micmen_generate_data.py:32-37), run the tempered SMC to gamma=1, and check
the posterior brackets the truth. With 6 datasets x 40 points the posterior
is tight, so moment checks are meaningful.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smc_tpu import SMCConfig, run_smc, run_smc_on_device
from smc_tpu.models.michaelis_menten import (
    MichaelisMentenModel, MM_TRUE_VMAX, MM_TRUE_KM, MM_TRUE_NOISE)


@pytest.fixture(scope="module")
def model():
    return MichaelisMentenModel.default(method="exact")


def _check_posterior(particles):
    mean = particles.mean(axis=0)
    std = particles.std(axis=0)
    # truth within ~4 posterior sds; posterior much tighter than the prior
    assert abs(mean[0] - MM_TRUE_VMAX) < 4 * std[0] + 0.05
    assert abs(mean[1] - MM_TRUE_KM) < 4 * std[1] + 0.05
    assert abs(mean[2] - MM_TRUE_NOISE) < 4 * std[2] + 0.01
    assert std[0] < 0.3 and std[1] < 0.3 and std[2] < 0.05


def test_mm_posterior_host_loop(model):
    cfg = SMCConfig(n_particles=512)
    state = run_smc(model, cfg, jax.random.key(0), verbose=False)
    assert float(state.gamma) == 1.0
    _check_posterior(np.asarray(state.particles))


def test_mm_posterior_fused_device_loop(model):
    cfg = SMCConfig(n_particles=512)
    state = run_smc_on_device(model, cfg, jax.random.key(1))
    assert float(state.gamma) == 1.0
    _check_posterior(np.asarray(state.particles))


def test_mm_posterior_full_run_program(model):
    """The key->posterior single-program path (make_full_run_on_device,
    init traced into the run) must agree with the state->state fused loop
    fed the identically-constructed init state: both trace the same ops on
    the same key, so the results match to compilation-fusion noise."""
    from smc_tpu.smc.driver import (init_state, make_full_run_on_device,
                                    run_smc_on_device)

    cfg = SMCConfig(n_particles=512)
    full = make_full_run_on_device(model, cfg)
    s_full = full(jax.random.key(1))
    assert float(s_full.gamma) == 1.0
    _check_posterior(np.asarray(s_full.particles))
    s_sep = run_smc_on_device(model, cfg,
                              state=init_state(jax.random.key(1), model, cfg),
                              key=jax.random.key(1))
    assert int(s_full.step) == int(s_sep.step)
    np.testing.assert_allclose(np.asarray(s_full.particles),
                               np.asarray(s_sep.particles),
                               rtol=1e-5, atol=1e-6)


def test_rk4_and_exact_likelihoods_agree(model):
    m_rk4 = MichaelisMentenModel.default(method="rk4")
    theta = jnp.asarray([[1.2, 0.5, 0.02], [2.0, 1.0, 0.05], [0.3, 3.0, 0.5]])
    ll_exact, _ = model.log_likelihood(theta)
    ll_rk4, _ = m_rk4.log_likelihood(theta)
    np.testing.assert_allclose(np.asarray(ll_exact), np.asarray(ll_rk4),
                               rtol=5e-3, atol=0.5)


def test_mm_fixed_sigma_mode():
    """est_sigma=False: 2-parameter estimation with sigma pinned to truth
    (the reference's est_sigma flag, Micmem_likelihood.py:47-50)."""
    m = MichaelisMentenModel.default(method="exact", est_sigma=False)
    assert m.param_names == ("Vmax", "Km")
    cfg = SMCConfig(n_particles=256)
    state = run_smc(m, cfg, jax.random.key(2), verbose=False)
    p = np.asarray(state.particles)
    assert p.shape[1] == 2
    assert abs(p[:, 0].mean() - MM_TRUE_VMAX) < 0.1
    assert abs(p[:, 1].mean() - MM_TRUE_KM) < 0.1
