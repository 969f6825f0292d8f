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


def take_datasets(states: SMCState, idx) -> SMCState:
    """Slice an ensemble state down to the datasets in ``idx`` (any
    leading-axis index: array, list, or boolean mask converted upstream).

    Every leaf with a leading dataset axis — including the per-dataset
    PRNG key leaf — is gathered, so the returned state is a fully valid
    smaller ensemble: each selected population keeps its exact particles,
    tempering position, controller state, and PRNG stream, and can be
    continued with ``run_ensemble_sweeps(..., states=take_datasets(...))``.

    Why this exists: population ladders differ by orders of magnitude
    (sharp-likelihood replicates climb gamma in 1e-6 steps), and the SPMD
    freeze mask means a full-ensemble sweep keeps paying device time for
    frozen populations — 73% waste by step 8 of the round-4 128-replicate
    SBC. Compacting to the still-tempering populations cut its remaining
    wall by ~3.4x (benchmarks/sbc_methanation_cont.py). Statistically
    free: each population's posterior depends only on its own state/data/
    keys, all of which are preserved verbatim.
    """
    if getattr(states.gamma, "ndim", 0) != 1:
        raise ValueError(
            "take_datasets expects an ensemble state (leading dataset "
            "axis: per-dataset gamma is (D,), got ndim="
            f"{getattr(states.gamma, 'ndim', 0)}); a single-run SMCState "
            "would be silently sliced along the particle axis")
    idx = jnp.asarray(idx)
    return jax.tree_util.tree_map(
        lambda x: x[idx] if getattr(x, "ndim", 0) else x, states)


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


def make_ensemble_sweep_fns(prior: Prior, loglik_fn: DataLogLik,
                            n_datasets: int, cfg: SMCConfig):
    """Sweep-granularity ensemble execution: like
    ``driver.make_sweep_step_fns`` but vmapped over the dataset axis, so
    no single device execution exceeds ONE mutation sweep of the whole
    ensemble (D x N likelihood rows). Required on the tunneled single
    chip whenever the fused whole-ensemble program
    (:func:`make_ensemble_run`) would run longer than the worker's ~100 s
    execution ceiling — e.g. a 128-replicate x 512-particle methanation
    SBC, whose fused run is tens of minutes of device time.

    Returns ``(einit, prep, mut_init, mut_sweep, finish)``:

    - ``einit(key, data) -> states`` — stacked prior draw + initial
      likelihood sweep (one bounded execution).
    - ``prep(states) -> (key, k_mh, g, parts, lk)`` — per-dataset gamma
      search + resampling; zero likelihood evals. Each returned leaf has
      leading axis D.
    - ``mut_init(k_mh, parts, lk, data) -> carry`` — vmapped
      mutation-loop init (zero evals for rwm).
    - ``mut_sweep(carry, gamma, data, active) -> carry`` — ONE sweep for
      every dataset; datasets with ``active[d] == False`` keep their old
      carry (their lanes still trace — the SPMD price, same as the fused
      ensemble's freeze mask).
    - ``finish(states, key, g, carry) -> states`` — fold results;
      populations already at gamma >= 1 before the step are frozen
      whole-state (key included), exactly like the fused body's
      where-mask.

    Same math and PRNG stream as :func:`make_ensemble_run` by
    construction (both vmap the same kernels.make_mutation_sweeper body).
    """
    from smc_tpu.smc.driver import _advance, _resample
    from smc_tpu.smc.kernels import (MutationResult, find_gamma,
                                     make_mutation_sweeper)

    def _sweeper_for(data_d):
        return make_mutation_sweeper(
            cfg.mutation, lambda th: loglik_fn(th, data_d), prior, cfg)

    @jax.jit
    def einit(key, data):
        return init_ensemble(key, prior, loglik_fn, data, n_datasets, cfg)

    def prep_one(state: SMCState):
        key, k_res, k_mh = jax.random.split(state.key, 3)
        g = find_gamma(state.log_lik, state.gamma, cfg)
        parts, lk = _resample(k_res, g, state, cfg, None)
        return key, k_mh, g, parts, lk

    @jax.jit
    def prep(states: SMCState):
        return jax.vmap(prep_one)(states)

    def mut_init_one(k_mh, parts, lk, data_d):
        init_fn, _ = _sweeper_for(data_d)
        return init_fn(k_mh, parts, lk)

    def mut_sweep_one(c, gamma, data_d, active):
        _, sweep_fn = _sweeper_for(data_d)
        new = sweep_fn(c, gamma)

        def sel(o, n):  # this dataset's scalar active flag, broadcast
            mask = active.reshape((1,) * o.ndim) if o.ndim else active
            return jnp.where(mask, n, o)

        return jax.tree_util.tree_map(sel, c, new)

    mut_init = jax.jit(jax.vmap(mut_init_one))
    mut_sweep = jax.jit(jax.vmap(mut_sweep_one))

    def fin_one(state, key, g, c):
        m = MutationResult(c.particles, c.log_lik, c.j, jnp.sum(c.r_ac),
                           c.mh_ratio)
        return _advance(state, key, g, m, cfg, None)

    @jax.jit
    def finish(states: SMCState, key, g, c) -> SMCState:
        new = jax.vmap(fin_one)(states, key, g, c)
        done = states.gamma >= 1.0

        def sel(old, new_):
            mask = done.reshape((-1,) + (1,) * (old.ndim - 1))
            return jnp.where(mask, old, new_)

        return jax.tree_util.tree_map(sel, states, new)

    return einit, prep, mut_init, mut_sweep, finish


def run_ensemble_sweeps(key: jax.Array, prior: Prior,
                        loglik_fn: DataLogLik, data, n_datasets: int,
                        cfg: SMCConfig, verbose: bool = False,
                        callback=None, states: SMCState = None,
                        stop_file=None) -> SMCState:
    """Host-observed ensemble run with every device execution bounded to
    at most one mutation sweep of the ensemble (see
    :func:`make_ensemble_sweep_fns`). ``callback(states)`` fires after
    every ensemble step (checkpointing hook for long on-chip SBC runs);
    pass ``states`` to resume. ``stop_file``: as in ``run_smc`` —
    touching it returns the last completed (checkpointed) ensemble step
    cleanly instead of tempering every replicate to gamma=1."""
    import numpy as np

    from smc_tpu.smc.driver import _stop_requested

    einit, prep, mut_init, mut_sweep, finish = make_ensemble_sweep_fns(
        prior, loglik_fn, n_datasets, cfg)
    if states is None:
        states = einit(key, data)
    while bool(jnp.any((states.gamma < 1.0)
                       & (states.step < cfg.max_steps))):
        if _stop_requested(stop_file):
            print(f"run_ensemble_sweeps: stop file {stop_file} present — "
                  f"returning at max step "
                  f"{int(np.asarray(states.step).max())}", flush=True)
            return states
        key_n, k_mh, g, parts, lk = prep(states)
        n_mh_d = np.where(np.asarray(g.gamma) >= 1.0, cfg.mh_steps_final,
                          cfg.mh_steps)
        frozen = np.asarray(states.gamma) >= 1.0
        c = mut_init(k_mh, parts, lk, data)
        while True:
            # Poll between every bounded device execution (one step at SBC
            # scale is many ~40s sweeps), matching _run_step_by_sweeps'
            # stop latency; return the pre-step states so the caller gets
            # the same last-COMPLETED-step semantics either way.
            if _stop_requested(stop_file):
                print(f"run_ensemble_sweeps: stop file {stop_file} present "
                      f"mid-step — returning last completed step "
                      f"{int(np.asarray(states.step).max())}", flush=True)
                return states
            active = (~np.asarray(c.done) & (np.asarray(c.j) < n_mh_d)
                      & ~frozen)
            if not active.any():
                break
            c = mut_sweep(c, g.gamma, data, jnp.asarray(active))
        states = finish(states, key_n, g, c)
        if verbose:
            ng = np.asarray(states.gamma)
            print(f"ensemble step: {int(np.asarray(states.step).max())}  "
                  f"gamma<1: {int((ng < 1.0).sum())}/{n_datasets}  "
                  f"min gamma: {float(ng.min()):.6f}", flush=True)
        if callback is not None:
            callback(states)
    return states


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
