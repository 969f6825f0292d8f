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
