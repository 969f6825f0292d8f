"""Generic stiff (BDF2+Newton) path: integrator golden tests + SMC e2e.

The reference handles its stiff problem by shipping it to SUNDIALS IDA on
the host (methanation_set_likelihood.py:169) and offers users no way to
bring their own stiff system. ``ops.implicit_ode.bdf2_grid`` +
``ODEModel(method="bdf2")`` is the rebuilt extension surface: these tests
pin (a) the implicit integrator against an independent scipy BDF solve of
the Robertson problem (rate constants spanning 9 orders of magnitude —
explicit steppers would need ~1e11 substeps), (b) agreement with the
explicit path on a non-stiff problem, (c) the per-lane Newton-residual
divergence mask, and (d) full SMC posterior recovery of the log-rate
constants.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smc_tpu import SMCConfig, run_smc
from smc_tpu.models.generic import (ROBERTSON_TRUE, ROBERTSON_TRUE_NOISE,
                                    lotka_volterra_model, robertson_model,
                                    robertson_dae_rhs, robertson_rhs)
from smc_tpu.ops.implicit_ode import bdf2_grid, make_consistent


@pytest.fixture(scope="module")
def model():
    return robertson_model()


def test_bdf2_matches_scipy_bdf_on_robertson(model):
    from scipy.integrate import solve_ivp

    theta = np.asarray([ROBERTSON_TRUE + (0.01,)], np.float32)
    y_path, _ = model.simulate(jnp.asarray(theta))    # (T, 3, 1)
    ts = np.asarray(model.ts, np.float64)
    k1, k2, k3 = (10.0 ** v for v in ROBERTSON_TRUE)

    def rhs(t, y):
        da = -k1 * y[0] + k3 * y[1] * y[2]
        dc = k2 * y[1] * y[1]
        return [da, -da - dc, dc]

    sol = solve_ivp(rhs, (ts[0], ts[-1]), [1.0, 0.0, 0.0], t_eval=ts,
                    method="BDF", rtol=1e-10, atol=1e-14)
    # simulate() already returns the demo's observable ([a, 1e4*b, c]);
    # apply the same scaling to the scipy reference only.
    scale = np.asarray([1.0, 1e4, 1.0])[:, None]
    got = np.asarray(y_path[:, :, 0]).T               # (3, T)
    want = sol.y * scale
    # fp32 BDF2 on 6 substeps/interval vs float64 reference: observables are
    # O(1); 2e-2 absolute covers the 2nd-order truncation on the log grid.
    np.testing.assert_allclose(got, want, atol=2e-2)


def test_bdf2_matches_rk4_on_nonstiff():
    base = lotka_volterra_model()
    m_bdf = dataclasses.replace(base, method="bdf2", substeps=24)
    theta = jnp.asarray([[1.0, 0.1, 0.075, 1.5, 0.3],
                         [0.7, 0.05, 0.04, 0.9, 0.5]])
    ll4, pred4 = base.log_likelihood(theta)
    llb, predb = m_bdf.log_likelihood(theta)
    np.testing.assert_allclose(np.asarray(pred4), np.asarray(predb),
                               rtol=5e-3, atol=5e-2)
    np.testing.assert_allclose(np.asarray(ll4), np.asarray(llb),
                               rtol=5e-3, atol=1.5)


def test_newton_residual_is_per_lane():
    """The divergence signal is reported per batch lane: a lane whose
    Newton iteration cannot converge (absurd stiffness for the iteration
    budget) must not poison the residual of a benign lane."""
    lk = jnp.asarray([[np.log10(0.04)], [14.0]])      # (2 lanes,) via batch
    p = {"lk1": lk[:, 0], "lk2": jnp.asarray([np.log10(3e7), 16.0]),
         "lk3": jnp.asarray([4.0, 15.0])}

    def f(t, y):
        return robertson_rhs(t, y, p)

    y0 = jnp.broadcast_to(jnp.asarray([[1.0], [0.0], [0.0]]), (3, 1))
    y0 = jnp.broadcast_to(y0[..., None], (3, 1, 2))
    ts = jnp.concatenate([jnp.zeros((1,)), jnp.logspace(-2, 2, 8)])
    ys, res = bdf2_grid(f, y0, ts, substeps=4, newton_iters=3)
    assert res.shape == (1, 2)
    res = np.asarray(res)
    assert np.isfinite(res[0, 0]) and res[0, 0] < 1e-3
    assert not (res[0, 1] < 1e-3)                     # big or nan


def test_failure_is_neg_inf_never_nan(model):
    theta = jnp.asarray([
        list(ROBERTSON_TRUE) + [-0.01],               # sigma <= 0
        [0.0, 8.5, 5.5, 0.01],                        # stiffest prior corner
        list(ROBERTSON_TRUE) + [0.01],                # truth
    ])
    ll, _ = model.log_likelihood(theta)
    ll = np.asarray(ll)
    assert not np.any(np.isnan(ll))
    assert ll[0] == -np.inf
    assert np.isfinite(ll[2])


def test_dae_form_matches_ode_form(model):
    """Semi-explicit DAE path (alg_mask + consistent init): the Robertson
    system with the conservation row algebraic must reproduce the pure-ODE
    trajectory AND log-likelihood — the generic analog of the reference
    delegating its DAE to IDA with algvar/suppress_alg
    (methanation_set_likelihood.py:183-188)."""
    m_dae = robertson_model(form="dae")
    theta = jnp.asarray([list(ROBERTSON_TRUE) + [0.01],
                         [-1.0, 7.0, 4.5, 0.02]])
    y_ode, _ = model.simulate(theta)
    y_dae, err = m_dae.simulate(theta)
    np.testing.assert_allclose(np.asarray(y_dae), np.asarray(y_ode),
                               atol=5e-3)
    # Same data were generated through each form's own simulate; compare
    # log-liks on the ODE model's observations for both paths.
    import dataclasses
    m_dae_same_obs = dataclasses.replace(m_dae, obs=model.obs)
    ll_o, _ = model.log_likelihood(theta)
    ll_d, _ = m_dae_same_obs.log_likelihood(theta)
    assert np.all(np.isfinite(np.asarray(ll_d)))
    np.testing.assert_allclose(np.asarray(ll_d), np.asarray(ll_o),
                               rtol=2e-2, atol=2.0)


def test_make_consistent_projects_algebraic_rows():
    """Inconsistent c0 must be Newton-projected onto a+b+c=1 with the
    differential rows pinned (IDA_YA_YDP_INIT analog)."""
    p = {"lk1": jnp.asarray([ROBERTSON_TRUE[0]]),
         "lk2": jnp.asarray([ROBERTSON_TRUE[1]]),
         "lk3": jnp.asarray([ROBERTSON_TRUE[2]])}

    def f(t, y):
        return robertson_dae_rhs(t, y, p)

    y0 = jnp.asarray([[0.7], [0.1], [0.9]])[..., None]    # c wrong
    y_c, res = make_consistent(f, y0, 0.0, (False, False, True))
    y_c = np.asarray(y_c)
    np.testing.assert_allclose(y_c[0, 0, 0], 0.7, rtol=1e-6)   # pinned
    np.testing.assert_allclose(y_c[1, 0, 0], 0.1, rtol=1e-6)   # pinned
    np.testing.assert_allclose(y_c[2, 0, 0], 0.2, atol=1e-6)   # projected
    assert float(np.asarray(res).max()) < 1e-6


def test_alg_mask_requires_bdf2(model):
    import dataclasses
    with pytest.raises(ValueError):
        dataclasses.replace(model, method="rk4",
                            alg_mask=(False, False, True))


def test_analytic_jac_matches_linearize(model):
    """User-supplied analytic Jacobian columns must reproduce the default
    jax.linearize-built Newton path."""
    import dataclasses

    def rob_jac(t, y, p):
        k1 = 10.0 ** p["lk1"]
        k2 = 10.0 ** p["lk2"]
        k3 = 10.0 ** p["lk3"]
        a, b, c = y[0], y[1], y[2]
        z = jnp.zeros_like(a)
        col_a = jnp.stack([-k1 + z, k1 + z, z])
        col_b = jnp.stack([k3 * c, -k3 * c - 2 * k2 * b, 2 * k2 * b])
        col_c = jnp.stack([k3 * b, -k3 * b, z])
        return [col_a, col_b, col_c]

    m_jac = dataclasses.replace(model, jac=rob_jac)
    theta = jnp.asarray([list(ROBERTSON_TRUE) + [0.01],
                         [-1.0, 7.0, 4.5, 0.02]])
    y_lin, _ = model.simulate(theta)
    y_ana, _ = m_jac.simulate(theta)
    np.testing.assert_allclose(np.asarray(y_ana), np.asarray(y_lin),
                               rtol=1e-5, atol=1e-5)


def test_robertson_posterior_recovers_truth(model):
    state = run_smc(model, SMCConfig(n_particles=512), jax.random.key(1),
                    verbose=False)
    assert float(state.gamma) == 1.0
    p = np.asarray(state.particles)
    mean, std = p.mean(axis=0), p.std(axis=0)
    truth = np.asarray(ROBERTSON_TRUE + (ROBERTSON_TRUE_NOISE,))
    assert np.all(np.abs(mean - truth) < 4 * std + 0.05 * np.abs(truth))
    # posterior concentrates well inside the prior box
    prior_width = np.asarray([3.0, 3.0, 3.0, 0.099]) / np.sqrt(12)
    assert np.all(std < 0.5 * prior_width)
