"""SMC driver: init + one fused step + host/device run loops.

The reference inlines this loop three near-identical times
(Micmem_SMC_main.py:105-271, SMC_methanation_main.py:201-427,
SMC_methanation.py:670-913). Here it exists once:

- ``make_smc_step`` builds ONE jitted function performing
  gamma-search -> resampling -> MH-mutation. All adaptive control flow
  (gamma shrink loop, MH early stop, step-ratio halving) runs on device as
  lax.while_loop — no host round-trips inside a step.
- ``run_smc`` is the observable host loop (per-step metric line, callbacks
  for plots/checkpoints — the reference's console line at
  SMC_methanation_main.py:410).
- ``run_smc_on_device`` fuses the entire run (all tempering steps) into a
  single XLA program for maximum throughput: one device dispatch per run.
"""
from __future__ import annotations

import logging
import time
import weakref
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from smc_tpu.config import SMCConfig
from smc_tpu.priors import Prior
from smc_tpu.smc.kernels import (find_gamma, mutate,
                                 residual_systematic_apply,
                                 residual_systematic_resample)
from smc_tpu.smc.state import SMCState

logger = logging.getLogger("smc_tpu")

LogLikFn = Callable[[jnp.ndarray], Tuple[jnp.ndarray, object]]


class StopRequested(Exception):
    """Raised inside a step when a cooperative stop file appears.

    Long detached runs on the single-chip tunnel cannot be preempted
    safely — killing a process mid-device-execution wedges the chip for
    ~20 min (CLAUDE.md). ``run_smc(stop_file=...)`` instead polls for the
    file between device executions (per block/sweep for the bounded
    granularities, per step for the fused one) and exits cleanly with the
    last *completed* step's state, which the per-step checkpoint already
    holds."""


def _stop_requested(stop_file: Optional[str]) -> bool:
    import os
    return stop_file is not None and os.path.exists(stop_file)


_INIT_JIT = {}


def _jitted_loglik(model):
    """Per-model cached jitted log_likelihood (models hold jnp arrays, so
    they are unhashable — key by id with weakref eviction). A FRESH
    jax.jit wrapper per call would retrace+recompile every init_state
    (bench.py calls run_smc_on_device once per seed in its timed loop)."""
    key = id(model)
    hit = _INIT_JIT.get(key)
    if hit is not None and hit[0]() is model:
        return hit[1]
    fn = jax.jit(model.log_likelihood)
    try:
        # capture the dict itself: at interpreter shutdown module globals
        # are already None when late weakref callbacks fire
        ref = weakref.ref(model,
                          lambda _, k=key, d=_INIT_JIT: d.pop(k, None))
    except TypeError:
        return fn
    _INIT_JIT[key] = (ref, fn)
    return fn


def init_state(key: jax.Array, model, cfg: SMCConfig,
               particles: Optional[jnp.ndarray] = None) -> SMCState:
    """Sample the prior and evaluate the initial likelihood sweep
    (reference: prior sampling Micmem_settings.py:84-87 + initial
    ``sim_particle`` at Micmem_SMC_main.py:98)."""
    key, k_init = jax.random.split(key)
    if particles is None:
        particles = model.prior.sample(k_init, cfg.n_particles, dtype=cfg.dtype)
    # jit the initial sweep: eagerly the DAE march runs op-by-op (minutes of
    # per-op dispatch over the device tunnel); jitted it is one fused program
    # that also lands in the persistent compilation cache.
    ll_fn = _jitted_loglik(model)
    b = cfg.block_particles
    if b and b < particles.shape[0]:
        # Bounded executions for huge N (same reason as granularity="block"
        # — at N=1e6 even the single initial sweep exceeds the tunnel
        # worker's survivable execution duration).
        log_lik = jnp.concatenate(
            [ll_fn(particles[s:s + b])[0]
             for s in range(0, particles.shape[0], b)])
    else:
        log_lik, _ = ll_fn(particles)
    zf = jnp.zeros((), cfg.dtype)
    zi = jnp.zeros((), jnp.int32)
    return SMCState(
        particles=particles, log_lik=log_lik,
        gamma=jnp.zeros((), cfg.dtype), key=key, step=zi,
        ess=jnp.ones((), cfg.dtype), max_log_lik=jnp.max(log_lik),
        n_mh=zi, accepted=zi, n_gamma_reductions=zi,
        mh_ratio=jnp.ones((), cfg.dtype),
        total_lik_evals=jnp.asarray(float(cfg.n_particles), jnp.float32),
        log_evidence=zf,
    )


def _pinner(psharding):
    def pin(x):
        if psharding is None:
            return x
        return jax.lax.with_sharding_constraint(x, psharding)
    return pin


def _resample(k_res, g, state: SMCState, cfg: SMCConfig, psharding):
    """Weight-proportional particle selection (shared by both step
    granularities). Returns pinned (particles, log_lik)."""
    pin = _pinner(psharding)
    if cfg.resampling == "ring" and psharding is not None:
        # Scale-out path: ring-exchange redistribution, O(N/S) traffic and
        # memory per chip (parallel/resample_shmap.resample_sharded_ring);
        # bitwise-equal to the "residual_systematic" branch below.
        from smc_tpu.parallel.resample_shmap import resample_sharded_ring
        parts, lk = resample_sharded_ring(
            k_res, g.weights, state.particles, state.log_lik,
            psharding.mesh)
        return pin(parts), pin(lk)
    f32 = (state.particles.dtype == jnp.float32
           and state.log_lik.dtype == jnp.float32)
    if cfg.resampling in ("residual_systematic", "ring") and f32:
        # Gather-free path: sorted ancestors let the particle/log-lik copy
        # run as scatter + batched prefix sum (bitwise-equal to the gather;
        # kernels.residual_systematic_apply). float32-only (the int32
        # bitcast trick); other dtypes take the equivalent gather below.
        parts, lk = residual_systematic_apply(
            k_res, g.weights, (state.particles, state.log_lik))
        return pin(parts), pin(lk)
    scheme = ("residual_systematic"
              if cfg.resampling in ("residual_systematic", "ring")
              else cfg.resampling)
    ancestors = residual_systematic_resample(k_res, g.weights, scheme=scheme)
    return (pin(jnp.take(state.particles, ancestors, axis=0)),
            pin(jnp.take(state.log_lik, ancestors, axis=0)))


def _advance(state: SMCState, key, g, m, cfg: SMCConfig,
             psharding) -> SMCState:
    """Fold a completed step's gamma + mutation results into the state
    (shared by both step granularities)."""
    pin = _pinner(psharding)
    return state.replace(
        particles=pin(m.particles), log_lik=pin(m.log_lik), gamma=g.gamma,
        key=key, step=state.step + 1, ess=g.ess, max_log_lik=g.max_log_lik,
        n_mh=m.n_steps, accepted=m.accepted.astype(jnp.int32),
        n_gamma_reductions=g.n_reductions, mh_ratio=m.mh_ratio,
        total_lik_evals=state.total_lik_evals
        + (m.n_steps.astype(jnp.float32) * cfg.evals_per_sweep
           * state.particles.shape[0]),
        log_evidence=state.log_evidence + g.log_z_inc,
    )


def smc_step(state: SMCState, loglik_fn: LogLikFn, prior: Prior,
             cfg: SMCConfig, psharding=None) -> SMCState:
    """One likelihood-tempered SMC step (Algorithm 1 body).

    ``psharding``: optional NamedSharding for particle-axis arrays. XLA's
    propagation tends to replicate the post-resampling gather output; pinning
    it keeps per-device memory at N/n_shards (required for 10^6+ particles).
    """
    key, k_res, k_mh = jax.random.split(state.key, 3)
    g = find_gamma(state.log_lik, state.gamma, cfg)
    parts, lk = _resample(k_res, g, state, cfg, psharding)
    m = mutate(k_mh, parts, lk, g.gamma, loglik_fn, prior, cfg)
    return _advance(state, key, g, m, cfg, psharding)


def make_sweep_step_fns(model, cfg: SMCConfig, psharding=None):
    """Sweep-granularity step: four jitted pieces, each device execution
    bounded by at most ``cfg.evals_per_sweep`` likelihood evaluations.

    The fused :func:`make_smc_step` program runs ALL of a step's adaptive
    MH sweeps inside one ``lax.while_loop`` — one XLA execution of
    (sweeps x likelihood) duration. At huge N on the single-chip tunnel
    that single execution exceeds the worker's survivable duration
    (~100 s; a 65 s likelihood sweep at N=1e5 survives, the 2-5-sweep
    fused step does not — docs/PERF.md "Execution-duration limit").
    This splits the step at its natural host-observable seams:

    - ``prep(state) -> (key, k_mh, g, parts, lk)``: gamma search +
      resampling. Zero likelihood evals.
    - ``mut_init(k_mh, parts, lk) -> MutationCarry``: mutation-loop init
      (one forward+VJP for mala/hmc, free for rwm).
    - ``mut_sweep(carry, gamma) -> MutationCarry``: ONE adaptive sweep —
      the same traced body the fused kernel while_loops over
      (kernels.make_mutation_sweeper), so both granularities run
      identical math with identical PRNG streams.
    - ``finish(state, key, g, carry) -> SMCState``: fold results.

    The adaptive controller decisions (early stop, sweep count) live in
    the carry (``carry.done``/``carry.j``) exactly as in the fused loop;
    the host merely reads them back between executions.
    """
    from smc_tpu.smc.kernels import MutationResult, make_mutation_sweeper
    init_fn, sweep_fn = make_mutation_sweeper(
        cfg.mutation, model.log_likelihood, model.prior, cfg)

    @jax.jit
    def prep(state: SMCState):
        key, k_res, k_mh = jax.random.split(state.key, 3)
        g = find_gamma(state.log_lik, state.gamma, cfg)
        parts, lk = _resample(k_res, g, state, cfg, psharding)
        return key, k_mh, g, parts, lk

    @jax.jit
    def finish(state: SMCState, key, g, c) -> SMCState:
        m = MutationResult(c.particles, c.log_lik, c.j, jnp.sum(c.r_ac),
                           c.mh_ratio)
        return _advance(state, key, g, m, cfg, psharding)

    return prep, jax.jit(init_fn), jax.jit(sweep_fn), finish


def _run_step_by_sweeps(state: SMCState, cfg: SMCConfig, fns,
                        stop_file: Optional[str] = None) -> SMCState:
    """One SMC step as a host loop over bounded device executions."""
    prep, mut_init, mut_sweep, finish = fns
    key, k_mh, g, parts, lk = prep(state)
    n_mh = cfg.mh_steps_final if float(g.gamma) >= 1.0 else cfg.mh_steps
    c = mut_init(k_mh, parts, lk)
    while int(c.j) < n_mh and not bool(c.done):
        if _stop_requested(stop_file):
            raise StopRequested(stop_file)
        c = mut_sweep(c, g.gamma)
    return finish(state, key, g, c)


def make_block_step_fns(model, cfg: SMCConfig, psharding=None):
    """Block-granularity step: like :func:`make_sweep_step_fns`, but each
    sweep's likelihood work is further split into ``n_particles /
    cfg.block_particles`` bounded device executions.

    At N = 1e6 methanation even ONE sweep is a ~10-minute execution —
    far over the tunnel worker's ~100 s ceiling (docs/PERF.md
    "Execution-duration limit") — so the sweep itself must be blocked.
    The mutation core is row-independent (kernels.make_mutation_parts):
    the per-sweep globals (preconditioner Cholesky) and the full-N
    randomness are computed in one cheap execution (``draw``, zero
    likelihood evals), each particle block then runs propose/evaluate/
    accept independently (``core``), and a final cheap execution folds
    the concatenated results into the adaptive controller state
    (``admin`` — early stop and step halving need global accept counts).
    Identical math and PRNG stream to the other granularities: the same
    z/log_u arrays are drawn once and sliced per block. Results are
    statistically (not bitwise) equal to the one-execution-per-sweep
    path: XLA compiles the likelihood separately per batch shape, and a
    measured ~0.2% of rows differ by one ulp between full-batch and
    block-batch programs — enough to flip rare accept decisions
    (tests/test_sweep_granularity.py pins the statistical parity).
    """
    from smc_tpu.smc.kernels import MutationResult, make_mutation_parts
    init_fn, draw_fn, core_fn, admin_fn, grad_fn = make_mutation_parts(
        cfg.mutation, model.log_likelihood, model.prior, cfg)

    @jax.jit
    def prep(state: SMCState):
        key, k_res, k_mh = jax.random.split(state.key, 3)
        g = find_gamma(state.log_lik, state.gamma, cfg)
        parts, lk = _resample(k_res, g, state, cfg, psharding)
        return key, k_mh, g, parts, lk

    @jax.jit
    def finish(state: SMCState, key, g, c) -> SMCState:
        m = MutationResult(c.particles, c.log_lik, c.j, jnp.sum(c.r_ac),
                           c.mh_ratio)
        return _advance(state, key, g, m, cfg, psharding)

    return (prep, jax.jit(init_fn), jax.jit(draw_fn), jax.jit(core_fn),
            jax.jit(admin_fn),
            None if grad_fn is None else jax.jit(grad_fn), finish)


def _run_step_by_blocks(state: SMCState, cfg: SMCConfig, fns,
                        stop_file: Optional[str] = None) -> SMCState:
    """One SMC step as a host loop over particle-blocked executions."""
    prep, mut_init, draw, core, admin, grad_fn, finish = fns
    block = cfg.block_particles or cfg.n_particles
    key, k_mh, g, parts, lk = prep(state)
    n = parts.shape[0]
    slabs = range(0, n, block)
    n_mh = cfg.mh_steps_final if float(g.gamma) >= 1.0 else cfg.mh_steps
    g0 = None
    if grad_fn is not None:
        g0 = jnp.concatenate([grad_fn(parts[s:s + block]) for s in slabs])
    c = mut_init(k_mh, parts, lk, g0)
    while int(c.j) < n_mh and not bool(c.done):
        skey, aux_g, aux_r = draw(c)
        outs = []
        for s in slabs:
            if _stop_requested(stop_file):
                # At N=1e6 a STEP is ~1 h of device time; polling between
                # ~1-min block executions keeps stop latency ~1 block.
                raise StopRequested(stop_file)
            outs.append(
                core(c.particles[s:s + block], c.log_lik[s:s + block],
                     c.log_prior[s:s + block],
                     c.grad if c.grad.ndim == 0 else c.grad[s:s + block],
                     c.mh_ratio, aux_g,
                     tuple(a[s:s + block] for a in aux_r), g.gamma))
        parts_n = jnp.concatenate([o[0] for o in outs])
        lk_n = jnp.concatenate([o[1] for o in outs])
        lp_n = jnp.concatenate([o[2] for o in outs])
        g_n = (outs[0][3] if outs[0][3].ndim == 0
               else jnp.concatenate([o[3] for o in outs]))
        acc = jnp.concatenate([o[4] for o in outs])
        c = admin(c, skey, parts_n, lk_n, lp_n, g_n, acc, g.gamma)
    return finish(state, key, g, c)


def make_smc_step(model, cfg: SMCConfig, donate: bool = True, psharding=None):
    """Jitted SMCState -> SMCState step closure over the model."""
    def _step(state: SMCState) -> SMCState:
        return smc_step(state, model.log_likelihood, model.prior, cfg,
                        psharding=psharding)
    return jax.jit(_step, donate_argnums=(0,) if donate else ())


def run_smc(model, cfg: SMCConfig, key: jax.Array,
            callback: Optional[Callable[[SMCState], None]] = None,
            state: Optional[SMCState] = None,
            verbose: bool = True, psharding=None,
            granularity: str = "step",
            stop_file: Optional[str] = None) -> SMCState:
    """Host-observable SMC run: jitted steps, per-step metric line.

    ``state`` may be a checkpointed state to resume from.

    ``granularity``: ``"step"`` jits one fused program per SMC step (all
    adaptive MH sweeps in one lax.while_loop — fastest); ``"sweep"``
    bounds every device execution to at most one mutation sweep
    (make_sweep_step_fns) — required on the single-chip tunnel at huge N,
    where a multi-minute fused execution crashes the TPU worker;
    ``"block"`` additionally splits each sweep into ``n_particles /
    cfg.block_particles`` executions (make_block_step_fns) — required
    when even one sweep exceeds the worker ceiling (N >= ~1e6
    methanation). All three run identical math and PRNG streams.

    ``stop_file``: optional path polled between device executions; when it
    appears the run returns the last completed step's state immediately
    (cooperative preemption — the only safe way to stop a detached run on
    the single-chip tunnel, see :class:`StopRequested`). An in-flight
    step's device work is abandoned, matching what a checkpoint reload
    would replay anyway.
    """
    if granularity not in ("step", "sweep", "block"):
        raise ValueError(f"unknown granularity {granularity!r}")
    if state is None:
        state = init_state(key, model, cfg)
    if granularity == "block":
        block_fns = make_block_step_fns(model, cfg, psharding=psharding)
        step_fn = lambda s: _run_step_by_blocks(s, cfg, block_fns,  # noqa: E731
                                                stop_file=stop_file)
    elif granularity == "sweep":
        sweep_fns = make_sweep_step_fns(model, cfg, psharding=psharding)
        step_fn = lambda s: _run_step_by_sweeps(s, cfg, sweep_fns,  # noqa: E731
                                                stop_file=stop_file)
    else:
        step_fn = make_smc_step(model, cfg, donate=False,
                                psharding=psharding)
    t0 = time.perf_counter()
    while int(state.step) < cfg.max_steps and float(state.gamma) < 1.0:
        if _stop_requested(stop_file):
            (logger.warning if logger.handlers else print)(
                f"run_smc: stop file {stop_file} present — returning at "
                f"step {int(state.step)} gamma={float(state.gamma):.6f}")
            return state
        try:
            state = step_fn(state)
        except StopRequested:
            (logger.warning if logger.handlers else print)(
                f"run_smc: stop requested mid-step — returning last "
                f"completed step {int(state.step)} "
                f"gamma={float(state.gamma):.6f}")
            return state
        if verbose:
            # Field-parity with the reference metric line (C26,
            # SMC_methanation_main.py:410).
            msg = (f"iteration:{int(state.step)}, nMH:{int(state.n_mh)}, "
                   f"Calculation time:{time.perf_counter() - t0:.3f}, "
                   f"ESS:{float(state.ess):.4f}, "
                   f"Max Likelihood:{float(state.max_log_lik):.4f}, "
                   f"New Gamma:{float(state.gamma):.6f}, "
                   f"Number of Adoption:{int(state.accepted)}")
            (logger.info if logger.handlers else print)(msg)
            if float(state.ess) < cfg.ess_limit:
                # gamma search exhausted its shrink budget
                # (SMC_methanation_main.py:239-240)
                print(f"ess reduction warning: ess = {float(state.ess)}")
        if callback is not None:
            callback(state)
    if float(state.gamma) < 1.0:
        msg = f"tempering didn't complete: last gamma = {float(state.gamma)}"
        (logger.warning if logger.handlers else print)(msg)
    return state


def make_run_on_device(model, cfg: SMCConfig, psharding=None):
    """Build the fused whole-run program: SMCState -> SMCState at gamma=1.

    The returned callable is jitted once; reuse it across repeated runs
    (different keys/data) to avoid per-call retracing.
    """
    def cond(s: SMCState):
        return (s.step < cfg.max_steps) & (s.gamma < 1.0)

    def body(s: SMCState):
        return smc_step(s, model.log_likelihood, model.prior, cfg,
                        psharding=psharding)

    @jax.jit
    def _run(s):
        return lax.while_loop(cond, body, s)

    return _run


def make_full_run_on_device(model, cfg: SMCConfig, psharding=None):
    """ONE jitted program: PRNG key -> completed SMCState at gamma = 1.

    Unlike ``make_run_on_device`` (state -> state), the prior draw and the
    initial likelihood sweep are traced INTO the program, so a deployment
    run costs a single device dispatch. Measured on the one-chip tunnel at
    1e5 particles (benchmarks/ab_full_run.py): the separate init path
    spends ~39 ms/run on the ~6 small init dispatches alone — more than
    the 29 ms the whole fused program takes on the TensorCore.
    """
    def cond(s: SMCState):
        return (s.step < cfg.max_steps) & (s.gamma < 1.0)

    def body(s: SMCState):
        return smc_step(s, model.log_likelihood, model.prior, cfg,
                        psharding=psharding)

    @jax.jit
    def _full(key):
        s = init_state(key, model, cfg)
        if psharding is not None:
            s = s.replace(
                particles=lax.with_sharding_constraint(s.particles,
                                                       psharding),
                log_lik=lax.with_sharding_constraint(s.log_lik, psharding))
        return lax.while_loop(cond, body, s)

    return _full


def run_smc_on_device(model, cfg: SMCConfig, key: jax.Array,
                      state: Optional[SMCState] = None,
                      psharding=None, run_fn=None) -> SMCState:
    """Entire SMC run as ONE jitted program (outer loop in lax.while_loop).

    Loop-exit parity with the reference: the step that raises gamma to 1
    still executes its (final-threshold) mutation, then the loop stops
    (Micmem_SMC_main.py:259-261).

    For repeated runs, build ``run_fn = make_run_on_device(model, cfg)``
    once and pass it in (a fresh closure here means a retrace per call).
    """
    if state is None:
        state = init_state(key, model, cfg)
    if run_fn is None:
        run_fn = make_run_on_device(model, cfg, psharding)
    return run_fn(state)
