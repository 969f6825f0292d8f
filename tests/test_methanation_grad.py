"""Differentiable flagship: implicit-function-theorem adjoint through the
steady-state DAE solve (models/methanation._make_steady_solve).

The reference's likelihood is opaque to derivatives (SUNDIALS IDA inside a
Ray worker, methanation_set_likelihood.py:169). Here ``march="steady"``
exposes exact gradients: F(y*, kin) = 0 implies
dl/dkin = -lambda^T dF/dkin with J^T lambda = dl/dy* — one transposed
block-Thomas solve + one residual VJP, no backprop through the march.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smc_tpu.models.methanation import MethanationModel


@pytest.fixture(scope="module")
def model():
    # the steady-certified small config (same as
    # test_methanation.py::test_steady_march_matches_long_transient)
    return MethanationModel.default(n_conditions=3, nx=15, n_steps=40,
                                    growth=1.3, particle_chunk=4,
                                    newton_iters=3, march="steady")


THETA0 = np.asarray([13.04, 52.2e3, 1.147e5, 96.7e3, 5.0], np.float32)


def test_steady_adjoint_matches_finite_differences(model):
    def f(th):
        ll, _ = model.log_likelihood(th[None])
        return ll[0]

    g = jax.jit(jax.grad(f))(jnp.asarray(THETA0))
    g = np.asarray(g)
    assert np.all(np.isfinite(g))

    # central differences with per-parameter relative step; the steady
    # solve is fp32 + certified to ~1e-4 relative residual, so FD itself
    # carries a few-percent noise floor — 10% relative separates a correct
    # adjoint from a sign/shift bug by orders of magnitude. Parameters
    # whose influence is below fp32 FD resolution (|fd·eps| under the ll's
    # ulp) are held to "both tiny" instead (there FD reads 0-to-noise
    # while the adjoint is the more accurate estimate).
    f_j = jax.jit(f)
    checked = 0
    for i in range(5):
        eps = 1e-3 * abs(THETA0[i])
        tp = THETA0.copy(); tp[i] += eps
        tm = THETA0.copy(); tm[i] -= eps
        fd = (float(f_j(jnp.asarray(tp))) - float(f_j(jnp.asarray(tm)))) \
            / (2 * eps)
        assert np.isfinite(fd)
        if max(abs(fd), abs(g[i])) * eps < 1e-3:
            assert abs(g[i] - fd) * eps < 1e-3, (i, g[i], fd)
            continue
        checked += 1
        assert abs(g[i] - fd) < 0.1 * max(abs(fd), abs(g[i])), (i, g[i], fd)
    assert checked >= 3            # the test must bite on most params


def test_steady_adjoint_sigma_grad_is_analytic(model):
    """sigma enters only the Gaussian likelihood, so its gradient has the
    closed form sum(r^2)/s^3 - 5*n_data/s — an exact pin (no FD noise)."""
    th = jnp.asarray(THETA0)

    def f(t):
        ll, _ = model.log_likelihood(t[None])
        return ll[0]

    g = np.asarray(jax.jit(jax.grad(f))(th))
    _, flows = jax.jit(model.log_likelihood)(th[None])
    r = np.asarray(flows[0]) - np.asarray(model.obs)
    s = THETA0[-1]
    want = (r ** 2).sum() / s ** 3 - 5 * model.obs.shape[1] / s
    np.testing.assert_allclose(g[-1], want, rtol=1e-4)


def test_failed_lane_grad_is_contained(model):
    """A particle at an absurd prior corner (march fails -> -10000 sentinel)
    must not poison the finite gradient of a healthy particle: per-lane
    adjoints never mix across the batch axis."""
    theta = jnp.asarray([THETA0, [1e5, 1.0, 1e6, 1.0, 5.0]], jnp.float32)

    def f(th):
        ll, _ = model.log_likelihood(th)
        return jnp.sum(jnp.where(jnp.isfinite(ll), ll, 0.0))

    g = np.asarray(jax.jit(jax.grad(f))(theta))
    assert np.all(np.isfinite(g[0]))
