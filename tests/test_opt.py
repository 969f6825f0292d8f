"""Multi-start gradient MAP estimation (smc_tpu.opt.map_estimate)."""
import jax
import jax.numpy as jnp
import numpy as np

from smc_tpu import map_estimate


def test_map_recovers_mm_truth():
    from smc_tpu.models.michaelis_menten import MichaelisMentenModel
    model = MichaelisMentenModel.default(method="exact")
    res = map_estimate(model, jax.random.key(0), n_starts=8)
    th = np.asarray(res.theta)
    # the MAP of a well-identified model with tight noise sits near truth
    assert abs(th[0] - 1.2) < 0.05
    assert abs(th[1] - 0.5) < 0.05
    assert abs(th[2] - 0.02) < 0.01
    # ... and beats the truth's own log-posterior (it is the argmax)
    ll_t, _ = model.log_likelihood(jnp.asarray([[1.2, 0.5, 0.02]]))
    lp_t = model.prior.log_pdf(jnp.asarray([[1.2, 0.5, 0.02]]))
    assert float(res.log_post) >= float(ll_t[0] + lp_t[0]) - 1e-3
    assert np.all(np.isfinite(np.asarray(res.all_log_post)))


def test_map_on_stiff_bdf2_model():
    from smc_tpu.models.generic import ROBERTSON_TRUE, robertson_model
    model = robertson_model()
    res = map_estimate(model, jax.random.key(1), n_starts=6, steps=250,
                       lr=0.03)
    th = np.asarray(res.theta)
    truth = np.asarray(ROBERTSON_TRUE)
    assert np.all(np.abs(th[:3] - truth) < 0.15)
