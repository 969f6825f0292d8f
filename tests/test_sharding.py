"""Multi-device tests on the virtual 8-CPU-device platform (conftest.py).

Validates that the SMC step is semantics-preserving under particle-axis
sharding and that outputs keep their shardings (no silent full replication).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smc_tpu import SMCConfig, init_state, make_smc_step, run_smc_on_device
from smc_tpu.models.michaelis_menten import MichaelisMentenModel
from smc_tpu.parallel.mesh import (
    make_mesh, particle_sharding, shard_state, run_smc_sharded, PARTICLE_AXIS)


@pytest.fixture(scope="module")
def model():
    return MichaelisMentenModel.default(method="exact")


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.shape[PARTICLE_AXIS] == 8


def test_sharded_step_matches_single_device(model):
    """One SMC step on sharded vs replicated state: same math, same RNG keys
    -> identical results up to reduction reassociation."""
    cfg = SMCConfig(n_particles=512)
    key = jax.random.key(0)
    mesh = make_mesh()

    state0 = init_state(key, model, cfg)
    step_fn = make_smc_step(model, cfg, donate=False)
    out_single = step_fn(state0)

    state_sh = shard_state(state0, mesh)
    step_fn_sh = make_smc_step(model, cfg, donate=False,
                               psharding=particle_sharding(mesh))
    out_sharded = step_fn_sh(state_sh)

    assert float(out_single.gamma) == pytest.approx(
        float(out_sharded.gamma), rel=1e-5)
    np.testing.assert_allclose(np.asarray(out_single.particles),
                               np.asarray(out_sharded.particles),
                               rtol=5e-4, atol=1e-5)
    # Output particles must stay sharded over the particle axis.
    out_sh = out_sharded.particles.sharding
    assert not out_sh.is_fully_replicated


def test_full_sharded_run_posterior(model):
    cfg = SMCConfig(n_particles=512)
    mesh = make_mesh()
    state = run_smc_sharded(model, cfg, jax.random.key(0), mesh,
                            on_device=True)
    assert float(state.gamma) == 1.0
    p = np.asarray(state.particles)
    assert abs(p[:, 0].mean() - 1.2) < 0.15
    assert abs(p[:, 1].mean() - 0.5) < 0.15


def test_ring_resampling_full_run_matches_default(model):
    """A full sharded run with cfg.resampling="ring" (ring-exchange
    redistribution inside the fused program) produces the same posterior as
    the default path — the resampler swap is exact, so the whole runs match
    to compilation-fusion noise."""
    mesh = make_mesh()
    key = jax.random.key(9)
    s_def = run_smc_sharded(model, SMCConfig(n_particles=512), key, mesh,
                            on_device=True, verbose=False)
    s_ring = run_smc_sharded(model,
                             SMCConfig(n_particles=512, resampling="ring"),
                             key, mesh, on_device=True, verbose=False)
    assert float(s_ring.gamma) == 1.0
    assert int(s_ring.step) == int(s_def.step)
    np.testing.assert_allclose(np.asarray(s_ring.particles),
                               np.asarray(s_def.particles),
                               rtol=1e-5, atol=1e-6)
    assert not s_ring.particles.sharding.is_fully_replicated


def test_ring_resampling_unsharded_fallback(model):
    """cfg.resampling="ring" without a mesh falls back to the identical
    single-chip residual-systematic path."""
    cfg = SMCConfig(n_particles=256, resampling="ring")
    s = run_smc_on_device(model, cfg, jax.random.key(2))
    s0 = run_smc_on_device(model, SMCConfig(n_particles=256),
                           jax.random.key(2))
    np.testing.assert_array_equal(np.asarray(s.particles),
                                  np.asarray(s0.particles))


def test_indivisible_particle_count_raises(model):
    mesh = make_mesh()
    with pytest.raises(ValueError):
        run_smc_sharded(model, SMCConfig(n_particles=500),
                        jax.random.key(0), mesh)


def test_large_sharded_fused_run(model):
    """Scale check for the cross-shard path: 2^15 particles over 8 devices,
    entire run in one fused program (collectives: pmax/psum reductions,
    prefix-sum counts, cross-shard resampling gather)."""
    cfg = SMCConfig(n_particles=32768)
    mesh = make_mesh()
    state = run_smc_sharded(model, cfg, jax.random.key(5), mesh,
                            on_device=True)
    assert float(state.gamma) == 1.0
    p = np.asarray(state.particles)
    assert abs(p[:, 0].mean() - 1.2) < 0.05
    assert abs(p[:, 1].mean() - 0.5) < 0.05


def test_full_run_from_key_sharded(model):
    """The deployment-shape program (make_full_run_on_device: prior draw +
    init sweep + all tempering steps fused into ONE dispatch, key ->
    posterior) compiles and runs with the particle axis sharded over the
    8-device mesh, keeps its outputs sharded, and reaches the right
    posterior."""
    from smc_tpu.smc.driver import make_full_run_on_device
    cfg = SMCConfig(n_particles=512)
    mesh = make_mesh()
    psh = particle_sharding(mesh)
    full = make_full_run_on_device(model, cfg, psharding=psh)
    state = full(jax.random.key(3))
    assert float(state.gamma) == 1.0
    assert not state.particles.sharding.is_fully_replicated
    p = np.asarray(state.particles)
    assert abs(p[:, 0].mean() - 1.2) < 0.15
    assert abs(p[:, 1].mean() - 0.5) < 0.15


def test_explicit_shard_map_resampler_matches_single_chip():
    """The hand-scheduled shard_map resampler (explicit all_gather/psum
    collectives, parallel/resample_shmap.py) reproduces the single-chip
    kernel bitwise for the same draw, with sharded outputs."""
    from smc_tpu.parallel.resample_shmap import resample_sharded
    from smc_tpu.smc.kernels import residual_systematic_resample
    mesh = make_mesh()
    n, d = 1024, 3
    key = jax.random.key(7)
    w = jax.nn.softmax(jax.random.normal(jax.random.key(1), (n,)) * 2.0)
    parts = jax.random.normal(jax.random.key(2), (n, d))
    lk = jax.random.normal(jax.random.key(3), (n,))
    anc = residual_systematic_resample(key, w)
    psh = particle_sharding(mesh)
    out_p, out_l = resample_sharded(
        key, jax.device_put(w, psh), jax.device_put(parts, psh),
        jax.device_put(lk, psh), mesh)
    np.testing.assert_array_equal(np.asarray(out_p), np.asarray(parts[anc]))
    np.testing.assert_array_equal(np.asarray(out_l), np.asarray(lk[anc]))
    assert not out_p.sharding.is_fully_replicated


@pytest.mark.parametrize("concentration", [2.0, 12.0])
def test_ring_resampler_matches_single_chip(concentration):
    """The O(N/S)-traffic ring-exchange resampler
    (parallel/resample_shmap.resample_sharded_ring) is bitwise-equal to the
    single-chip kernel: same draw, same integer counts, same sorted-slot
    ancestors. concentration=12 makes the weights spike on a few particles
    so ancestors span many shards — forcing multiple ppermute rounds (the
    data-dependent while_loop path), not just the local round-0 fill."""
    from smc_tpu.parallel.resample_shmap import resample_sharded_ring
    from smc_tpu.smc.kernels import residual_systematic_resample
    mesh = make_mesh()
    n, d = 1024, 3
    key = jax.random.key(11)
    w = jax.nn.softmax(
        jax.random.normal(jax.random.key(4), (n,)) * concentration)
    parts = jax.random.normal(jax.random.key(2), (n, d))
    lk = jax.random.normal(jax.random.key(3), (n,))
    anc = residual_systematic_resample(key, w)
    psh = particle_sharding(mesh)
    out_p, out_l = resample_sharded_ring(
        key, jax.device_put(w, psh), jax.device_put(parts, psh),
        jax.device_put(lk, psh), mesh)
    np.testing.assert_array_equal(np.asarray(out_p), np.asarray(parts[anc]))
    np.testing.assert_array_equal(np.asarray(out_l), np.asarray(lk[anc]))
    assert not out_p.sharding.is_fully_replicated
