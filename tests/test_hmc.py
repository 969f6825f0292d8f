"""Preconditioned HMC mutation (cfg.mutation="hmc").

Beyond-reference capability #3 in the mutation-kernel family (RWM = the
reference's only option, Micmem_SMC_main.py:186-251; MALA = one-step
Langevin drift): cfg.hmc_leapfrog leapfrog steps of likelihood-gradient
Hamiltonian dynamics per proposal, exact MH-corrected. Correctness bar is
the same as MALA's: the kernel must target the identical invariant
distribution, pinned on (a) an analytic Gaussian with known moments,
(b) the banana ridge vs the RWM kernel (the case HMC exists for —
trajectories follow the curved ridge), (c) gradients THROUGH the ODE
integrator end-to-end, (d) the fused device-loop path, (e) eval-cost
accounting (leapfrog multiplier).
"""
import jax
import numpy as np
import pytest

from smc_tpu import SMCConfig, run_smc
from tests.test_mala import _GaussianTarget


def test_hmc_targets_exact_gaussian():
    model = _GaussianTarget()
    cfg = SMCConfig(n_particles=4096, mutation="hmc", hmc_leapfrog=3)
    state = run_smc(model, cfg, jax.random.key(0), verbose=False)
    assert float(state.gamma) == 1.0
    p = np.asarray(state.particles)
    se = model.s / np.sqrt(4096)
    np.testing.assert_allclose(p.mean(0), model.mu, atol=10 * se)
    np.testing.assert_allclose(p.std(0), model.s, rtol=0.15)


def test_hmc_matches_rwm_on_banana():
    from smc_tpu.models.synthetic import BananaModel
    model = BananaModel()
    k = jax.random.key(3)
    s_rwm = run_smc(model, SMCConfig(n_particles=4096), k, verbose=False)
    s_hmc = run_smc(model, SMCConfig(n_particles=4096, mutation="hmc"), k,
                    verbose=False)
    pr, ph = np.asarray(s_rwm.particles), np.asarray(s_hmc.particles)
    np.testing.assert_allclose(ph.mean(0), pr.mean(0), atol=0.25)
    np.testing.assert_allclose(ph.std(0), pr.std(0), rtol=0.3)
    resid = ph[:, 1] - ph[:, 0] ** 2
    assert abs(resid.mean()) < 0.1


def test_hmc_through_ode_integrator():
    from smc_tpu.models.michaelis_menten import MichaelisMentenModel
    model = MichaelisMentenModel.default(method="exact")
    cfg = SMCConfig(n_particles=512, mutation="hmc", hmc_leapfrog=3)
    state = run_smc(model, cfg, jax.random.key(1), verbose=False)
    assert float(state.gamma) == 1.0
    p = np.asarray(state.particles)
    truth = np.asarray([1.2, 0.5, 0.02])
    assert np.all(np.abs(p.mean(0) - truth) < 5 * p.std(0) + 0.02)
    assert not np.any(np.isnan(p))


def test_hmc_fused_device_loop_matches_host_loop():
    from smc_tpu import run_smc_on_device
    model = _GaussianTarget()
    cfg = SMCConfig(n_particles=1024, mutation="hmc", hmc_leapfrog=2)
    k = jax.random.key(7)
    s_host = run_smc(model, cfg, k, verbose=False)
    s_dev = run_smc_on_device(model, cfg, k)
    np.testing.assert_allclose(np.asarray(s_dev.particles),
                               np.asarray(s_host.particles),
                               rtol=1e-5, atol=1e-5)
    assert float(s_dev.gamma) == 1.0


def test_hmc_eval_accounting():
    """total_lik_evals must count hmc_leapfrog evaluations per sweep (each
    leapfrog step is one likelihood+VJP), vs 1 for rwm."""
    assert SMCConfig(mutation="hmc", hmc_leapfrog=4).evals_per_sweep == 4
    assert SMCConfig(mutation="rwm").evals_per_sweep == 1
    assert SMCConfig(mutation="mala").evals_per_sweep == 1

    model = _GaussianTarget()
    n = 256
    cfg = SMCConfig(n_particles=n, mutation="hmc", hmc_leapfrog=4,
                    max_steps=3)
    st = run_smc(model, cfg, jax.random.key(2), verbose=False)
    sweeps_counted = (float(st.total_lik_evals) - n) / n  # minus init evals
    assert sweeps_counted % 4 == 0 and sweeps_counted >= 4


def test_hmc_leapfrog_validation():
    with pytest.raises(ValueError):
        SMCConfig(mutation="hmc", hmc_leapfrog=0)
