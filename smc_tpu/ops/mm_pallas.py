"""Pallas TPU kernel: fused Michaelis-Menten log-likelihood.

The jnp RK4 path executes ~624 sequential elementwise ops on a (n_ds, B)
state, each round-tripping the state through HBM — bandwidth-bound. This
kernel keeps the state, parameters, and running residual accumulators
resident in VMEM for the whole trajectory: one HBM read of (theta, obs), one
HBM write of ll. The entire likelihood (the reference's per-particle scipy
solve_ivp + Gaussian sum, Micmem_likelihood.py:35-77) becomes a single
compute-bound kernel.

Assumes the shared uniform observation grid the MM datasets use
(t = linspace(0, 10, T), Micmen_generate_data.py:16).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LOG2PI = float(np.log(2 * np.pi))


def _mm_kernel(vmax_ref, km_ref, sig_ref, s0_ref, obs_ref, ll_ref, *,
               n_obs: int, dt: float, substeps: int, n_ds: int):
    Vmax = vmax_ref[:]            # (1, Bt)
    Km = km_ref[:]                # (1, Bt)
    s0 = s0_ref[:]                # (n_ds, 1)
    S = jnp.broadcast_to(s0, (n_ds, Vmax.shape[1]))  # (n_ds, Bt)
    acc0 = jnp.zeros((n_ds, Vmax.shape[1]), S.dtype)

    h = dt / substeps

    def f(S):
        return -Vmax * S / (Km + S)

    # Fully static unroll over the observation grid (Mosaic forbids dynamic
    # lane-dim indexing of obs_ref; n_obs is small and static, so constant
    # indices compile cleanly and the whole march fuses in VMEM).
    obs = obs_ref[:]                                  # (n_ds, n_obs)
    r0 = obs[:, 0:1] - (s0 - S)
    acc = acc0 + r0 * r0
    for i in range(n_obs - 1):
        for _ in range(substeps):
            k1 = f(S)
            k2 = f(S + 0.5 * h * k1)
            k3 = f(S + 0.5 * h * k2)
            k4 = f(S + h * k3)
            S = S + (h / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)
        r = obs[:, i + 1:i + 2] - (s0 - S)
        acc = acc + r * r

    sigma = jnp.maximum(sig_ref[:], 1e-12)          # (1, Bt)
    ll = (-0.5 * n_obs * n_ds * (_LOG2PI + 2.0 * jnp.log(sigma))
          - jnp.sum(acc, axis=0, keepdims=True) / (2.0 * sigma * sigma))
    bad = (sig_ref[:] <= 0.0) | ~(ll == ll)
    ll_ref[:] = jnp.where(bad, -jnp.inf, ll)


# Initializer coefficients (fit offline vs scipy.special.lambertw,
# Lawson-reweighted least squares on Chebyshev nodes):
# - [3/3] Pade of W(z)/z on z in [0, e]              (max rel err 3.7e-6)
# - [3/3] rational of W(e^u)/u in t = (u - 30.5)/29.5 on u = logz in
#   [1, 60] (max rel err 1.2e-4 exact, 1.6e-4 evaluated in fp32 — the
#   W/u form keeps every intermediate O(1) so fp32 Horner is safe, where
#   a direct rational of W loses 3 digits to edge cancellation).
# One Halley corrector (cubic: 1.6e-4 -> ~4e-12) makes the result exact
# to fp32 over logz in [-60, 60]: 2.1e-10 max rel err in fp64 sim, and in
# fp32 the same ~2.5e-7 (2 ULP roundoff floor) as 2 Halley steps from the
# round-1 asymptotic-ln initializer. The initializer itself costs ZERO
# transcendentals, so W is ONE exp per evaluation.
_PADE_W = (2.0756442, 0.736134059, 0.0134467679,
           3.0754228, 2.31554992, 0.353759838)
_GOU = (0.8917337208536824, 1.8982396128879397, 1.2165240727257451,
        0.20561353314077788,
        2.0499910593108703, 1.2599020418616451, 0.20550595307370517)


def _lambertw_fast(z, logz, iters: int = 1):
    """W(z) given both z and logz = ln z, transcendental-minimal:
    rational initializer + ``iters`` Halley steps (one exp each).

    Measured NEGATIVE variant (benchmarks/ab_halley_exp.py, same-process
    A/B on one v5e): replacing a Halley exp with a 3rd-order Taylor
    update of the previous one (numerically exact at fp32 — post-init
    corrections are small) ran 1.05 vs 1.00 ms/sweep. The kernel is
    VECTOR-OP-COUNT bound, not transcendental bound: the VPU's exp is
    about as cheap as the 4 FMAs that would replace it, and the Taylor
    factor lengthens the serial dependency chain. Shortening the Halley
    chain itself (the round-2 [3/3] W/u initializer, good enough for ONE
    step — benchmarks/ab_one_halley.py) is what pays."""
    a1, a2, a3, b1, b2, b3 = _PADE_W
    w_small = z * (1.0 + z * (a1 + z * (a2 + z * a3))) \
        / (1.0 + z * (b1 + z * (b2 + z * b3)))
    g0, g1, g2, g3, h1, h2, h3 = _GOU
    t = (logz - 30.5) * (1.0 / 29.5)
    w_big = logz * (g0 + t * (g1 + t * (g2 + t * g3))) \
        / (1.0 + t * (h1 + t * (h2 + t * h3)))
    w = jnp.where(z > jnp.e, w_big, w_small)
    for _ in range(iters):
        ew = jnp.exp(w)
        f = w * ew - z
        denom = ew * (w + 1.0) - (w + 2.0) * f / (2.0 * w + 2.0)
        w = w - f / jnp.where(jnp.abs(denom) < 1e-30, 1e-30, denom)
    return w


_SUBP = 16   # particle-block sublanes: each op runs on dense (16, 128) tiles


def _mm_exact_kernel(vmax_ref, km_ref, sig_ref, s0_ref, obs_ref, ll_ref, *,
                     n_obs: int, dt: float, n_ds: int, iters: int):
    """Closed-form MM likelihood, fully VMEM-resident and
    transcendental-minimal.

    The math is the implicit MM solution the reference approximates with
    scipy RK45 (Micmem_likelihood.py:24-30):
    S(t) = Km * W((S0/Km) exp((S0 - Vmax t)/Km)). Because
    ln z(t) = ln(S0/Km) + (S0 - Vmax t)/Km is LINEAR in t, z marches by one
    per-particle multiply per grid point (z *= exp(-Vmax dt / Km), the exp
    hoisted out of the time loop) and logz by one subtract; W costs ONE
    Halley exp per point from a rational (zero-transcendental) initializer
    good to 1.6e-4 (cubic correction -> fp32-exact). Per particle per
    sweep: ~1 transcendental per observation point vs ~7 for the
    materialized jnp path — and zero HBM traffic for intermediates.

    Layout: the particle block rides as a dense (SUBP, 128) = (sublane,
    lane) tile grid and the dataset axis is the UNTILED leading dim — a
    flat (n_ds, block) layout pads the 6-dataset axis to 8 sublanes and
    wastes 25% of every VPU issue (measured 1.00 -> 0.80 ms/sweep at 1e5;
    the kernel is vector-op-count-bound, benchmarks/ab_halley_exp.py).
    s0/obs arrive pre-broadcast over lanes (host-side, tiny) so no
    sublane-axis relayouts happen inside the time loop.

    Tail deviation vs the jnp "exact" path: z is clipped to e^+-60 at t=0
    only (the recurrence then evolves freely) where the jnp path re-clips
    at every grid point; they differ only for parameter draws with
    |ln z| > 60 (Km near 0), where both are saturated approximations and
    the likelihood is astronomically rejected anyway.
    """
    Vmax = vmax_ref[0]                       # (SUBP, L)
    Km = jnp.maximum(km_ref[0], 1e-8)
    sub, lane = Vmax.shape
    s0 = jnp.broadcast_to(s0_ref[0], (n_ds, 1, lane))    # (n_ds, 1, L)
    inv_km = 1.0 / Km                        # (SUBP, L)
    bdt = Vmax * dt * inv_km
    decay = jnp.exp(-bdt)                    # 1 exp per particle per sweep
    logz = (jnp.log(Km) * (-1.0))[None] + jnp.log(s0) + s0 * inv_km[None]
    z = jnp.exp(jnp.clip(logz, -60.0, 60.0))  # (n_ds, SUBP, L)

    # t = 0: S = s0 exactly, no solve needed.
    r0 = jnp.broadcast_to(obs_ref[0, 0], (n_ds, sub, lane))
    acc = r0 * r0
    for i in range(1, n_obs):
        z = z * decay[None]
        logz = logz - bdt[None]
        w = _lambertw_fast(z, logz, iters)
        r = obs_ref[0, i] - (s0 - Km[None] * w)
        acc = acc + r * r

    sigma = jnp.maximum(sig_ref[0], 1e-12)
    ll = (-0.5 * n_obs * n_ds * (_LOG2PI + 2.0 * jnp.log(sigma))
          - jnp.sum(acc, axis=0) / (2.0 * sigma * sigma))
    bad = (sig_ref[0] <= 0.0) | ~(ll == ll)
    ll_ref[0] = jnp.where(bad, -jnp.inf, ll)


@functools.partial(jax.jit, static_argnames=("dt", "block", "iters",
                                             "interpret"))
def mm_loglik_exact_pallas_batched(theta: jnp.ndarray, obs: jnp.ndarray,
                                   s0: jnp.ndarray, dt: float,
                                   block: int = 2048, iters: int = 1,
                                   interpret: bool = False) -> jnp.ndarray:
    """theta (B, N, 3), obs (B, n_ds, T), s0 (B, n_ds) -> ll (B, N).

    B independent populations, each with its OWN observation set, in one
    kernel launch: populations ride the grid (each population pads to a
    whole number of particle blocks; block b serves population b // t,
    whose s0/obs block the index maps select). This is the hierarchical
    ensemble's likelihood shape (smc/ensemble.py vmaps the SMC step over
    populations; the reference's analog is one whole process invocation
    per dataset, SMC_methanation_main.py)."""
    b_pop, n = theta.shape[0], theta.shape[1]
    n_ds, n_obs = obs.shape[1], obs.shape[2]
    lane = 128
    tile = _SUBP * lane
    block = max(tile, (block // tile) * tile)
    n_pad = -(-n // block) * block
    if n_pad != n:
        pad = jnp.ones((b_pop, n_pad - n, 3), theta.dtype)
        theta = jnp.concatenate([theta, pad], axis=1)
    t = n_pad // block
    sub = block // lane

    kern = functools.partial(_mm_exact_kernel, n_obs=n_obs, dt=dt,
                             n_ds=n_ds, iters=iters)
    col = lambda k: theta[..., k].reshape(b_pop * t, sub, lane)
    part_spec = pl.BlockSpec((1, sub, lane), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    # s0 / obs pre-broadcast over lanes (tiny, once per call) so the time
    # loop never relayouts the untiled dataset axis.
    s0b = jnp.broadcast_to(s0[:, :, None, None], (b_pop, n_ds, 1, lane))
    obsb = jnp.broadcast_to(
        jnp.swapaxes(obs, 1, 2)[:, :, :, None, None],
        (b_pop, n_obs, n_ds, 1, lane))
    ll = pl.pallas_call(
        kern,
        grid=(b_pop * t,),
        in_specs=[
            part_spec, part_spec, part_spec,
            pl.BlockSpec((1, n_ds, 1, lane), lambda i: (i // t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_obs, n_ds, 1, lane),
                         lambda i: (i // t, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=part_spec,
        out_shape=jax.ShapeDtypeStruct((b_pop * t, sub, lane), theta.dtype),
        interpret=interpret,
    )(col(0), col(1), col(2), s0b, obsb)
    return ll.reshape(b_pop, n_pad)[:, :n]


@functools.partial(jax.jit, static_argnames=("dt", "block", "iters",
                                             "interpret"))
def mm_loglik_exact_pallas(theta: jnp.ndarray, obs: jnp.ndarray,
                           s0: jnp.ndarray, dt: float, block: int = 2048,
                           iters: int = 1, interpret: bool = False
                           ) -> jnp.ndarray:
    """theta (N, 3), obs (n_ds, T), s0 (n_ds,) -> ll (N,). Closed-form MM
    likelihood as one fused VMEM-resident kernel (see _mm_exact_kernel).
    ``block`` = particles per grid step, a multiple of 16*128 = 2048 (the
    dense (sublane, lane) particle tile)."""
    return mm_loglik_exact_pallas_batched(
        theta[None], obs[None], s0[None], dt, block=block, iters=iters,
        interpret=interpret)[0]


@functools.lru_cache(maxsize=None)
def _exact_pallas_vmappable(dt: float, block: int, iters: int,
                            interpret: bool):
    """custom_vmap wrapper: plain calls hit the single-population kernel;
    a vmapped call (the ensemble's per-population likelihood) lowers to
    ONE batched kernel launch instead of failing Mosaic's block-shape
    checks. Cached per static config so the rule registers once."""
    @jax.custom_batching.custom_vmap
    def fn(theta, obs, s0):
        return mm_loglik_exact_pallas(theta, obs, s0, dt, block=block,
                                      iters=iters, interpret=interpret)

    @fn.def_vmap
    def _rule(axis_size, in_batched, theta, obs, s0):
        tb, ob, sb = in_batched
        if not tb:
            theta = jnp.broadcast_to(theta, (axis_size,) + theta.shape)
        if not ob:
            obs = jnp.broadcast_to(obs, (axis_size,) + obs.shape)
        if not sb:
            s0 = jnp.broadcast_to(s0, (axis_size,) + s0.shape)
        out = mm_loglik_exact_pallas_batched(theta, obs, s0, dt,
                                             block=block, iters=iters,
                                             interpret=interpret)
        return out, True

    return fn


@functools.partial(jax.jit, static_argnames=("dt", "substeps", "block",
                                             "interpret"))
def mm_loglik_pallas(theta: jnp.ndarray, obs: jnp.ndarray, s0: jnp.ndarray,
                     dt: float, substeps: int = 4, block: int = 8192,
                     interpret: bool = False) -> jnp.ndarray:
    """theta (N, 3), obs (n_ds, T), s0 (n_ds,), dt = uniform grid spacing
    -> ll (N,)."""
    n = theta.shape[0]
    n_ds, n_obs = obs.shape
    block = min(block, n)
    n_pad = -(-n // block) * block
    if n_pad != n:
        pad = jnp.ones((n_pad - n, 3), theta.dtype)
        theta = jnp.concatenate([theta, pad], axis=0)

    kern = functools.partial(_mm_kernel, n_obs=n_obs, dt=dt,
                             substeps=substeps, n_ds=n_ds)
    grid = (n_pad // block,)
    lane_spec = pl.BlockSpec((1, block), lambda i: (0, i),
                             memory_space=pltpu.VMEM)
    ll = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            lane_spec, lane_spec, lane_spec,
            pl.BlockSpec((n_ds, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_ds, n_obs), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=lane_spec,
        out_shape=jax.ShapeDtypeStruct((1, n_pad), theta.dtype),
        interpret=interpret,
    )(theta[:, 0][None], theta[:, 1][None], theta[:, 2][None],
      s0[:, None], obs)
    return ll[0, :n]
