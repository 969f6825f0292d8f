"""Sharded methanation likelihood: the flattened particle x condition batch
must compute correctly with the particle axis sharded over the mesh."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from smc_tpu.models.methanation import MethanationModel
from smc_tpu.parallel.mesh import make_mesh, particle_sharding


def test_sharded_methanation_likelihood_matches():
    model = MethanationModel.default(n_conditions=2, nx=11, n_steps=10,
                                     growth=1.6, particle_chunk=16)
    mesh = make_mesh()
    theta = jnp.tile(jnp.asarray([[13.04, 52.2e3, 1.147e5, 96.7e3, 5.0]],
                                 jnp.float32), (16, 1))
    theta = theta + jnp.linspace(0, 1, 16)[:, None] * jnp.asarray(
        [1.0, 100.0, 1e4, 100.0, 0.1])

    ll_ref, fl_ref = jax.jit(model.log_likelihood)(theta)

    theta_sh = jax.device_put(theta, particle_sharding(mesh))
    ll_sh, fl_sh = jax.jit(model.log_likelihood)(theta_sh)

    np.testing.assert_allclose(np.asarray(ll_sh), np.asarray(ll_ref),
                               rtol=1e-4, atol=0.05)
    np.testing.assert_allclose(np.asarray(fl_sh), np.asarray(fl_ref),
                               rtol=1e-3, atol=1e-3)


def test_methanation_2d_mesh_condition_axis_sharded():
    """2-D particles x data mesh (VERDICT round-1 item 8): the flattened
    particle x condition lane axis is pinned over BOTH mesh axes, so the
    condition dimension itself is distributed (4 conditions over 4 "data"
    shards, particles over 2 "particles" shards). Results must match the
    single-device model and stay non-replicated."""
    mesh2d = make_mesh(8, n_data=4)
    base = MethanationModel.default(n_conditions=4, nx=11, n_steps=10,
                                    growth=1.6, particle_chunk=16)
    model = dataclasses.replace(base, lane_mesh=mesh2d)
    theta = base.prior.sample(jax.random.key(3), 16)

    ll_ref, fl_ref = jax.jit(base.log_likelihood)(theta)
    ll_sh, fl_sh = jax.jit(model.log_likelihood)(theta)

    np.testing.assert_allclose(np.asarray(ll_sh), np.asarray(ll_ref),
                               rtol=1e-4, atol=0.05)
    np.testing.assert_allclose(np.asarray(fl_sh), np.asarray(fl_ref),
                               rtol=1e-3, atol=1e-3)


def test_ensemble_on_2d_dataset_sharded_mesh():
    """Hierarchical ensemble on a dataset-sharded 2-D mesh: 4 populations
    over the "data" axis x particle halves over the "particles" axis; the
    fused while_loop program must converge every population and keep the
    particle arrays non-replicated."""
    from smc_tpu import SMCConfig
    from smc_tpu.models.michaelis_menten import (generate_mm_pseudo_data,
                                                 make_mm_data_loglik)
    from smc_tpu.priors import Prior
    from smc_tpu.smc.ensemble import run_ensemble_on_device

    ts, obs0, s0 = generate_mm_pseudo_data()
    keys = jax.random.split(jax.random.key(1), 4)
    obs = jnp.stack([jnp.asarray(obs0) + 0.02 * jax.random.normal(
        k, obs0.shape) for k in keys])
    loglik = make_mm_data_loglik(jnp.asarray(ts), jnp.asarray(s0))
    prior = Prior.uniform([0.0, 0.0, 0.0], [10.0, 10.0, 10.0])
    cfg = SMCConfig(n_particles=128)
    mesh2d = make_mesh(8, n_data=4)

    states = run_ensemble_on_device(jax.random.key(0), prior, loglik, obs,
                                    4, cfg, mesh=mesh2d)
    assert (np.asarray(states.gamma) == 1.0).all()
    assert not states.particles.sharding.is_fully_replicated
    p = np.asarray(states.particles)          # (4, 128, 3)
    assert np.abs(p[:, :, 0].mean(1) - 1.2).max() < 0.25
    assert np.abs(p[:, :, 1].mean(1) - 0.5).max() < 0.25


def test_sharded_methanation_smc_step():
    from smc_tpu import SMCConfig, init_state, make_smc_step
    from smc_tpu.parallel.mesh import shard_state
    model = MethanationModel.default(n_conditions=2, nx=11, n_steps=10,
                                     growth=1.6, particle_chunk=32)
    cfg = SMCConfig(n_particles=32, mh_steps=1, mh_steps_final=1)
    mesh = make_mesh()
    state = shard_state(init_state(jax.random.key(0), model, cfg), mesh)
    step = make_smc_step(model, cfg, donate=False,
                         psharding=particle_sharding(mesh))
    out = step(state)
    assert np.isfinite(np.asarray(out.particles)).all()
    assert not out.particles.sharding.is_fully_replicated
