"""Sweep-granularity execution (run_smc(granularity="sweep")).

The fused step program runs all of a step's adaptive MH sweeps inside one
lax.while_loop — one XLA execution whose duration grows with N. On the
tunneled single-chip TPU an execution above ~100 s crashes the worker
(docs/PERF.md "Execution-duration limit"), so huge-N runs need each device
execution bounded to <= one mutation sweep. Both granularities trace the
SAME sweep body (kernels.make_mutation_sweeper); these tests pin that the
host-orchestrated controller reproduces the fused loop's decisions:
bitwise for RWM (no gradient fusion differences), statistically for
MALA/HMC (separately-compiled VJPs may differ by ulps, flipping rare
accept decisions).
"""
import jax
import numpy as np
import pytest

from smc_tpu import SMCConfig, run_smc
from smc_tpu.models.michaelis_menten import (
    MichaelisMentenModel, MM_TRUE_VMAX, MM_TRUE_KM, MM_TRUE_NOISE)


@pytest.fixture(scope="module")
def model():
    return MichaelisMentenModel.default(method="exact")


def test_rwm_sweep_bitwise_matches_fused(model):
    cfg = SMCConfig(n_particles=1024)
    k = jax.random.key(0)
    s_step = run_smc(model, cfg, k, verbose=False, granularity="step")
    s_sweep = run_smc(model, cfg, k, verbose=False, granularity="sweep")
    assert float(s_step.gamma) == float(s_sweep.gamma) == 1.0
    assert int(s_step.step) == int(s_sweep.step)
    assert float(s_step.total_lik_evals) == float(s_sweep.total_lik_evals)
    np.testing.assert_array_equal(np.asarray(s_step.particles),
                                  np.asarray(s_sweep.particles))
    np.testing.assert_array_equal(np.asarray(s_step.log_lik),
                                  np.asarray(s_sweep.log_lik))


@pytest.mark.parametrize("mutation", ["mala", "hmc"])
def test_gradient_kernels_sweep_statistical_parity(model, mutation):
    cfg = SMCConfig(n_particles=1024, mutation=mutation, hmc_leapfrog=2)
    k = jax.random.key(1)
    s_step = run_smc(model, cfg, k, verbose=False, granularity="step")
    s_sweep = run_smc(model, cfg, k, verbose=False, granularity="sweep")
    assert float(s_step.gamma) == float(s_sweep.gamma) == 1.0
    p1, p2 = np.asarray(s_step.particles), np.asarray(s_sweep.particles)
    # same invariant distribution: moments agree to sampling error
    np.testing.assert_allclose(p1.mean(0), p2.mean(0),
                               atol=4 * p1.std(0).max() / np.sqrt(1024))
    np.testing.assert_allclose(p1.std(0), p2.std(0), rtol=0.2)
    truth = np.array([MM_TRUE_VMAX, MM_TRUE_KM, MM_TRUE_NOISE])
    assert np.all(np.abs(p2.mean(0) - truth) < 5 * p2.std(0))


def test_sweep_bounds_every_execution(model, monkeypatch):
    """Each jitted piece runs at most cfg.evals_per_sweep likelihood
    evaluations: count sweeps via the mut_sweep call boundary."""
    from smc_tpu.smc import driver as drv
    calls = {"sweep": 0, "prep": 0}
    orig = drv.make_sweep_step_fns

    def counting(model_, cfg_, psharding=None):
        prep, mut_init, mut_sweep, finish = orig(model_, cfg_, psharding)

        def prep2(s):
            calls["prep"] += 1
            return prep(s)

        def sweep2(c, g):
            calls["sweep"] += 1
            return mut_sweep(c, g)

        return prep2, mut_init, sweep2, finish

    monkeypatch.setattr(drv, "make_sweep_step_fns", counting)
    cfg = SMCConfig(n_particles=256)
    s = run_smc(model, cfg, jax.random.key(2), verbose=False,
                granularity="sweep")
    assert float(s.gamma) == 1.0
    assert calls["prep"] == int(s.step)
    # total sweeps == total evals / N (rwm: one eval per sweep)
    assert calls["sweep"] == (float(s.total_lik_evals) - 256) / 256


def test_unknown_granularity_rejected(model):
    with pytest.raises(ValueError, match="granularity"):
        run_smc(model, SMCConfig(n_particles=64), jax.random.key(0),
                verbose=False, granularity="bogus")


def test_rwm_block_statistical_parity(model):
    """granularity="block" splits each sweep's likelihood work into
    n_particles/block_particles bounded executions. The mutation core is
    row-independent and the sweep randomness is drawn once and sliced,
    but XLA compiles the likelihood separately per batch shape and a
    measured ~0.2% of rows differ by one ulp between the full-batch and
    block-batch programs — enough to flip rare accept decisions, after
    which trajectories diverge chaotically. Parity is therefore
    statistical (same invariant distribution), the same standard as the
    gradient-kind sweep-vs-fused test above."""
    k = jax.random.key(0)
    s_sweep = run_smc(model, SMCConfig(n_particles=1024), k,
                      verbose=False, granularity="sweep")
    cfg = SMCConfig(n_particles=1024, block_particles=256)
    s_block = run_smc(model, cfg, k, verbose=False, granularity="block")
    assert float(s_block.gamma) == 1.0
    p1, p2 = np.asarray(s_sweep.particles), np.asarray(s_block.particles)
    np.testing.assert_allclose(p1.mean(0), p2.mean(0),
                               atol=4 * p1.std(0).max() / np.sqrt(1024))
    np.testing.assert_allclose(p1.std(0), p2.std(0), rtol=0.2)
    truth = np.array([MM_TRUE_VMAX, MM_TRUE_KM, MM_TRUE_NOISE])
    assert np.all(np.abs(p2.mean(0) - truth) < 5 * p2.std(0))


def test_mala_block_statistical_parity(model):
    """Gradient-based kinds block too (per-block VJPs); separately
    compiled block shapes may differ by ulps, so parity is statistical
    (same standard as the sweep-vs-fused gradient test above)."""
    k = jax.random.key(1)
    s_sweep = run_smc(model, SMCConfig(n_particles=1024, mutation="mala"),
                      k, verbose=False, granularity="sweep")
    cfg = SMCConfig(n_particles=1024, mutation="mala", block_particles=512)
    s_block = run_smc(model, cfg, k, verbose=False, granularity="block")
    assert float(s_block.gamma) == 1.0
    p1, p2 = np.asarray(s_sweep.particles), np.asarray(s_block.particles)
    np.testing.assert_allclose(p1.mean(0), p2.mean(0),
                               atol=4 * p1.std(0).max() / np.sqrt(1024))
    np.testing.assert_allclose(p1.std(0), p2.std(0), rtol=0.2)


def test_block_bounds_every_execution(model, monkeypatch):
    """Every likelihood-bearing execution covers exactly block_particles
    rows: count core-call boundaries and check their block shapes."""
    from smc_tpu.smc import driver as drv
    calls = {"core": 0, "draw": 0}
    orig = drv.make_block_step_fns

    def counting(model_, cfg_, psharding=None):
        prep, init, draw, core, admin, grad, finish = orig(
            model_, cfg_, psharding)

        def draw2(c):
            calls["draw"] += 1
            return draw(c)

        def core2(parts, *a):
            assert parts.shape[0] == 64
            calls["core"] += 1
            return core(parts, *a)

        return prep, init, draw2, core2, admin, grad, finish

    monkeypatch.setattr(drv, "make_block_step_fns", counting)
    cfg = SMCConfig(n_particles=256, block_particles=64)
    s = run_smc(model, cfg, jax.random.key(2), verbose=False,
                granularity="block")
    assert float(s.gamma) == 1.0
    # one draw per sweep; 4 core executions per sweep
    assert calls["core"] == 4 * calls["draw"]
    assert calls["draw"] == (float(s.total_lik_evals) - 256) / 256


def test_block_particles_must_divide():
    with pytest.raises(ValueError, match="block_particles"):
        SMCConfig(n_particles=100, block_particles=32)
