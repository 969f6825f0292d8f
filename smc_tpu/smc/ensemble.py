"""Hierarchical multi-dataset SMC ensemble (BASELINE.json config 5).

Runs D independent tempered-SMC populations — one per dataset — inside ONE
jitted program: the whole SMC step (gamma search, resampling, mutation) is
``vmap``-ed over a leading dataset axis, so each population carries its own
adaptive gamma schedule, MH early-stop, and step-ratio state, while the
device sees a single fused (D x N x ...) computation. Populations whose
tempering has finished are frozen with a where-mask (their step still traces
— the price of SPMD — but their state no longer changes).

The reference has no equivalent (it runs one dataset per process
invocation); this is the "nested vmap over datasets x particles,
per-dataset tempering schedules" scale-out the north star asks for. On a
mesh, shard the dataset axis and/or the particle axis.
"""
from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from smc_tpu.config import SMCConfig
from smc_tpu.priors import Prior
from smc_tpu.smc.driver import smc_step
from smc_tpu.smc.state import SMCState

# loglik_fn(theta (N,d), data_slice) -> (log_lik (N,), aux)
DataLogLik = Callable[[jnp.ndarray, object], Tuple[jnp.ndarray, object]]


def init_ensemble(key: jax.Array, prior: Prior, loglik_fn: DataLogLik,
                  data, n_datasets: int, cfg: SMCConfig) -> SMCState:
    """Stacked SMCState with leading dataset axis D."""
    keys = jax.random.split(key, n_datasets)

    def one(k, data_d):
        k, k_init = jax.random.split(k)
        particles = prior.sample(k_init, cfg.n_particles, dtype=cfg.dtype)
        log_lik, _ = loglik_fn(particles, data_d)
        zi = jnp.zeros((), jnp.int32)
        return SMCState(
            particles=particles, log_lik=log_lik,
            gamma=jnp.zeros((), cfg.dtype), key=k, step=zi,
            ess=jnp.ones((), cfg.dtype), max_log_lik=jnp.max(log_lik),
            n_mh=zi, accepted=zi, n_gamma_reductions=zi,
            mh_ratio=jnp.ones((), cfg.dtype),
            total_lik_evals=jnp.asarray(float(cfg.n_particles), jnp.float32),
            log_evidence=jnp.zeros((), cfg.dtype))

    return jax.vmap(one)(keys, data)


def make_ensemble_run(prior: Prior, loglik_fn: DataLogLik, n_datasets: int,
                      cfg: SMCConfig, mesh=None):
    """Build the deployment-shape ensemble program: ONE jitted function
    ``fn(key, data) -> SMCState`` taking all D populations from prior draw
    to gamma = 1 in a single device dispatch (the ensemble analog of
    ``driver.make_full_run_on_device``). Build once, call with fresh
    keys/data — repeated calls reuse the executable.

    ``mesh``: optional 2-D mesh from ``make_mesh(n_devices, n_data)`` — the
    dataset axis is sharded over the "data" mesh axis and each population's
    particle axis over the "particles" axis (the 2-D particlesxdata layout
    of SURVEY §2's parallelism table). Every population's resampling gather
    stays within its "particles" sub-ring; per-dataset reductions become
    psum/pmax over that axis only.
    """
    pin = lambda x: x
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        from smc_tpu.parallel.mesh import DATA_AXIS, PARTICLE_AXIS

        def _shard_tree(tree):
            def place(x):
                if x.ndim >= 2 and x.shape[1] == cfg.n_particles:
                    spec = P(DATA_AXIS, PARTICLE_AXIS)
                elif x.ndim >= 1 and x.shape[0] == n_datasets:
                    spec = P(DATA_AXIS)
                else:
                    spec = P()
                return jax.lax.with_sharding_constraint(
                    x, NamedSharding(mesh, spec))
            return jax.tree_util.tree_map(place, tree)

        pin = _shard_tree

    def step_one(state, data_d):
        return smc_step(state, lambda th: loglik_fn(th, data_d), prior, cfg)

    vstep = jax.vmap(step_one)

    def cond(ss: SMCState):
        return jnp.any((ss.gamma < 1.0) & (ss.step < cfg.max_steps))

    def make_body(data):
        def body(ss: SMCState):
            new = vstep(ss, data)
            done = ss.gamma >= 1.0

            def sel(old, new_):
                mask = done.reshape((-1,) + (1,) * (old.ndim - 1))
                return jnp.where(mask, old, new_)

            return pin(jax.tree_util.tree_map(sel, ss, new))
        return body

    @jax.jit
    def _run(key, data):
        states = pin(init_ensemble(key, prior, loglik_fn, data,
                                   n_datasets, cfg))
        return lax.while_loop(cond, make_body(data), states)

    return _run


def run_ensemble_on_device(key: jax.Array, prior: Prior,
                           loglik_fn: DataLogLik, data, n_datasets: int,
                           cfg: SMCConfig, mesh=None) -> SMCState:
    """All D populations to gamma = 1 in one fused while_loop program.

    One-shot convenience over ``make_ensemble_run`` (which see for the
    ``mesh`` semantics); for repeated runs build the program once.
    """
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        from smc_tpu.parallel.mesh import DATA_AXIS
        data = jax.device_put(data, NamedSharding(mesh, P(DATA_AXIS)))
    return make_ensemble_run(prior, loglik_fn, n_datasets, cfg, mesh)(
        key, data)
