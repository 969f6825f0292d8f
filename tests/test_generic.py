"""Generic user-defined ODEModel: simulator parity vs scipy + SMC e2e.

The reference has no extension surface at all — a new application means a
copy-pasted main script (SURVEY.md §1). ``models.generic.ODEModel`` is the
rebuilt equivalent: these tests pin (a) the lanes-major integrator against
an independent scipy solve_ivp of the same system, (b) that the full SMC
machinery (host loop AND fused whole-run program) recovers known truth for
a model the framework has never seen, and (c) the failure invariant
(-inf, never NaN) for out-of-support / diverged parameters.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smc_tpu import SMCConfig, run_smc
from smc_tpu.models.generic import (LV_TRUE, LV_TRUE_NOISE, ODEModel,
                                    lotka_volterra_model, lotka_volterra_rhs)
from smc_tpu.priors import Prior


@pytest.fixture(scope="module")
def model():
    return lotka_volterra_model()


def test_simulate_matches_scipy(model):
    from scipy.integrate import solve_ivp

    theta = np.asarray([LV_TRUE + (0.1,)], np.float32)
    y_path, _ = model.simulate(jnp.asarray(theta))   # (T, n_series, 1)
    ts = np.asarray(model.ts, np.float64)
    a, b, d, g = LV_TRUE
    for s in range(model.y0.shape[1]):
        sol = solve_ivp(
            lambda t, y: [a * y[0] - b * y[0] * y[1],
                          d * y[0] * y[1] - g * y[1]],
            (ts[0], ts[-1]), np.asarray(model.y0[:, s], np.float64),
            t_eval=ts, rtol=1e-9, atol=1e-9)
        np.testing.assert_allclose(np.asarray(y_path[:, s, 0]), sol.y[0],
                                   rtol=2e-3, atol=2e-3)


def test_dopri5_matches_rk4(model):
    import dataclasses
    m5 = dataclasses.replace(model, method="dopri5")
    theta = jnp.asarray([[1.0, 0.1, 0.075, 1.5, 0.3],
                         [0.7, 0.05, 0.04, 0.9, 0.5]])
    ll4, pred4 = model.log_likelihood(theta)
    ll5, pred5 = m5.log_likelihood(theta)
    np.testing.assert_allclose(np.asarray(ll4), np.asarray(ll5),
                               rtol=1e-3, atol=0.5)
    np.testing.assert_allclose(np.asarray(pred4), np.asarray(pred5),
                               rtol=1e-3, atol=1e-2)


def test_failure_is_neg_inf_never_nan(model):
    theta = jnp.asarray([
        [1.0, 0.1, 0.075, 1.5, -0.1],    # sigma <= 0
        [3.0, 0.5, 0.5, 3.0, 0.3],       # stiff corner of the prior box
        [1.0, 0.1, 0.075, 1.5, 0.3],     # fine
    ])
    ll, _ = model.log_likelihood(theta)
    ll = np.asarray(ll)
    assert not np.any(np.isnan(ll))
    assert ll[0] == -np.inf
    assert np.isfinite(ll[2])


def test_lv_posterior_recovers_truth(model):
    cfg = SMCConfig(n_particles=1024)
    state = run_smc(model, cfg, jax.random.key(0), verbose=False)
    assert float(state.gamma) == 1.0
    p = np.asarray(state.particles)
    mean, std = p.mean(axis=0), p.std(axis=0)
    truth = np.asarray(LV_TRUE + (LV_TRUE_NOISE,))
    # truth within ~4 posterior sds, posterior much tighter than the prior
    assert np.all(np.abs(mean - truth) < 4 * std + 0.05 * truth)
    prior_width = np.asarray([2.9, 0.49, 0.49, 2.9, 1.99]) / np.sqrt(12)
    assert np.all(std < 0.35 * prior_width)


def test_full_run_program_compiles_and_runs(model):
    from smc_tpu.smc.driver import make_full_run_on_device

    cfg = SMCConfig(n_particles=256)
    full = make_full_run_on_device(model, cfg)
    s = full(jax.random.key(3))
    assert float(s.gamma) == 1.0
    assert np.isfinite(float(s.log_evidence))


def test_custom_observable_and_fixed_sigma():
    """Observing predators (y[1]) instead of prey; sigma fixed."""
    base = lotka_volterra_model()
    import dataclasses
    m = dataclasses.replace(
        base, observe=lambda y: y[1],
        param_names=("alpha", "beta", "delta", "gamma"),
        prior=Prior.uniform([0.1, 0.01, 0.01, 0.1], [3.0, 0.5, 0.5, 3.0]),
        est_sigma=False, sigma_fixed=LV_TRUE_NOISE)
    m = m.generate_data(LV_TRUE, jax.random.key(7), LV_TRUE_NOISE)
    ll, pred = m.log_likelihood(
        jnp.asarray([[1.0, 0.1, 0.075, 1.5]]))
    assert np.isfinite(float(ll[0]))
    assert pred.shape == (1, m.obs.shape[0], m.obs.shape[1])
    state = run_smc(m, SMCConfig(n_particles=512), jax.random.key(8),
                    verbose=False)
    p = np.asarray(state.particles)
    assert p.shape[1] == 4
    assert abs(p[:, 0].mean() - LV_TRUE[0]) < 4 * p[:, 0].std() + 0.1
