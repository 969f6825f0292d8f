"""Prior API tests vs scipy.stats (reference pdf path Micmem_SMC_main.py:60-90)."""
import jax
import jax.numpy as jnp
import numpy as np
import scipy.stats

from smc_tpu.priors import Prior


def test_uniform_logpdf_matches_scipy():
    p = Prior.uniform([0.0, -1.0], [10.0, 3.0])
    theta = np.array([[5.0, 0.0], [0.0, 3.0], [11.0, 0.0], [5.0, -2.0]])
    got = np.asarray(p.log_pdf(jnp.asarray(theta, jnp.float32)))
    ref = (scipy.stats.uniform.logpdf(theta[:, 0], 0, 10)
           + scipy.stats.uniform.logpdf(theta[:, 1], -1, 4))
    np.testing.assert_allclose(got, ref, rtol=1e-5)


def test_normal_logpdf_matches_scipy():
    p = Prior.normal([1.0, -2.0], [0.5, 3.0])
    theta = np.random.default_rng(0).normal(size=(16, 2))
    got = np.asarray(p.log_pdf(jnp.asarray(theta, jnp.float32)))
    ref = (scipy.stats.norm.logpdf(theta[:, 0], 1.0, 0.5)
           + scipy.stats.norm.logpdf(theta[:, 1], -2.0, 3.0))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_mixed_from_specs_sampling_moments():
    p = Prior.from_specs([
        {"dist": "uniform", "low": 0, "high": 10},
        {"dist": "normal", "mu": 5.0, "sigma": 2.0},
    ])
    x = np.asarray(p.sample(jax.random.key(0), 200_000))
    assert x.shape == (200_000, 2)
    np.testing.assert_allclose(x[:, 0].mean(), 5.0, atol=0.05)
    np.testing.assert_allclose(x[:, 0].min(), 0.0, atol=0.01)
    np.testing.assert_allclose(x[:, 1].mean(), 5.0, atol=0.05)
    np.testing.assert_allclose(x[:, 1].std(), 2.0, atol=0.05)


def test_support_mask():
    p = Prior.uniform([0.0], [1.0])
    theta = jnp.asarray([[0.5], [-0.1], [1.1]])
    np.testing.assert_array_equal(np.asarray(p.in_support(theta)),
                                  [True, False, False])
