"""Marginal-likelihood (evidence) estimation along the tempering path.

Tempered SMC yields log Z = sum_k log((1/N) sum_i exp(dgamma_k * ll_i)) for
free (the standard Del Moral/Doucet/Jasra estimator from each step's
unnormalized incremental weights). The reference never computes it; it is
the quantity Bayesian model comparison needs, so smc-tpu accumulates it in
SMCState.log_evidence.

Analytic anchor: prior N(m0=2, s0=1), likelihood factor
L(theta) = exp(-theta^2 / (2 * 0.5)):
    Z = int N(theta; 2, 1) exp(-theta^2) dtheta = exp(-4/3) / sqrt(3),
    log Z = -4/3 - log(3)/2 = -1.882617...
(same conjugate model as test_posterior_parity's normal-prior check, which
pins the matching posterior N(2/3, 1/3)).
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from smc_tpu import SMCConfig, run_smc_on_device
from smc_tpu.priors import Prior

LOG_Z_TRUE = -4.0 / 3.0 - 0.5 * float(np.log(3.0))


@dataclasses.dataclass(frozen=True)
class ConjugateModel:
    prior: Prior
    param_names = ("theta",)

    def log_likelihood(self, theta):
        return -theta[:, 0] ** 2 / (2.0 * 0.5), None


def test_log_evidence_matches_analytic_conjugate():
    model = ConjugateModel(Prior.normal(jnp.asarray([2.0]),
                                        jnp.asarray([1.0])))
    cfg = SMCConfig(n_particles=8192)
    vals = []
    for seed in range(3):
        state = run_smc_on_device(model, cfg, jax.random.key(seed))
        assert float(state.gamma) == 1.0
        vals.append(float(state.log_evidence))
    vals = np.asarray(vals)
    # Per-replica MC spread at N=8192 with ESS >= 0.5 per step is ~1e-2.
    assert np.all(np.abs(vals - LOG_Z_TRUE) < 0.15), vals
    assert abs(vals.mean() - LOG_Z_TRUE) < 0.05, vals


def test_log_evidence_survives_checkpoint_roundtrip(tmp_path):
    from smc_tpu.io.checkpoint import load_state, save_state
    from smc_tpu.models.michaelis_menten import MichaelisMentenModel
    from smc_tpu.smc.driver import init_state, make_smc_step

    model = MichaelisMentenModel.default(method="exact")
    cfg = SMCConfig(n_particles=128)
    s = make_smc_step(model, cfg, donate=False)(
        init_state(jax.random.key(0), model, cfg))
    assert np.isfinite(float(s.log_evidence))
    p = str(tmp_path / "ck.npz")
    save_state(p, s)
    s2 = load_state(p)
    assert float(s2.log_evidence) == float(s.log_evidence)


def test_pre_evidence_checkpoints_still_load(tmp_path):
    """Forward compatibility: .npz snapshots written before the
    log_evidence field existed load with the neutral value 0."""
    from smc_tpu.io.checkpoint import load_state, save_state, _flatten
    from smc_tpu.models.michaelis_menten import MichaelisMentenModel
    from smc_tpu.smc.driver import init_state

    model = MichaelisMentenModel.default(method="exact")
    s = init_state(jax.random.key(0), model, SMCConfig(n_particles=64))
    flat = _flatten(s)
    flat.pop("log_evidence")
    p = str(tmp_path / "old.npz")
    np.savez(p, **flat)
    s2 = load_state(p)
    assert float(s2.log_evidence) == 0.0
