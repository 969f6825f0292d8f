"""Integrator golden tests vs scipy solve_ivp (the reference's solver,
Micmem_likelihood.py:24-30) and the closed-form Lambert-W solution."""
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.integrate import solve_ivp
from scipy.special import lambertw as scipy_lambertw

from smc_tpu.ops.ode import rk4_grid, dopri5_grid
from smc_tpu.ops.lambertw import lambertw


def _mm_rhs(t, S, Vmax=1.2, Km=0.5):
    return -Vmax * S / (Km + S)


@pytest.mark.parametrize("s0", [0.1, 0.5, 2.0])
def test_rk4_matches_scipy(s0):
    ts = np.linspace(0, 10, 40)
    ref = solve_ivp(_mm_rhs, (0, 10), [s0], t_eval=ts, method="RK45",
                    rtol=1e-8, atol=1e-10).y[0]
    ys = rk4_grid(lambda t, y: _mm_rhs(t, y), jnp.asarray([s0]),
                  jnp.asarray(ts), substeps=4)
    np.testing.assert_allclose(np.asarray(ys)[:, 0], ref, rtol=2e-5, atol=1e-6)


def test_dopri5_matches_scipy():
    ts = np.linspace(0, 10, 40)
    ref = solve_ivp(_mm_rhs, (0, 10), [1.0], t_eval=ts, method="RK45",
                    rtol=1e-8, atol=1e-10).y[0]
    ys, err = dopri5_grid(lambda t, y: _mm_rhs(t, y), jnp.asarray([1.0]),
                          jnp.asarray(ts), substeps=2)
    np.testing.assert_allclose(np.asarray(ys)[:, 0], ref, rtol=1e-5, atol=1e-7)
    assert float(err) < 1e-5


def test_lambertw_matches_scipy():
    z = np.concatenate([np.linspace(0, 5, 100),
                        np.logspace(1, 20, 50)]).astype(np.float32)
    w = np.asarray(lambertw(jnp.asarray(z)))
    ref = scipy_lambertw(z.astype(np.float64)).real
    np.testing.assert_allclose(w, ref, rtol=3e-6, atol=1e-6)


def test_mm_closed_form_equals_rk4():
    """Lambert-W progress curve == numerically integrated trajectory."""
    Vmax, Km, s0 = 1.2, 0.5, 2.0
    ts = np.linspace(0, 10, 40)
    ys = rk4_grid(lambda t, y: -Vmax * y / (Km + y), jnp.asarray([s0]),
                  jnp.asarray(ts), substeps=8)
    logz = np.log(s0 / Km) + (s0 - Vmax * ts) / Km
    S_exact = Km * np.asarray(lambertw(jnp.asarray(np.exp(logz))))
    np.testing.assert_allclose(np.asarray(ys)[:, 0], S_exact, rtol=1e-4,
                               atol=1e-6)
