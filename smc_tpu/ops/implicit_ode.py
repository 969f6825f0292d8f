"""On-device implicit (stiff) ODE integrator for user-defined models.

The explicit steppers in :mod:`smc_tpu.ops.ode` replace the reference's
scipy ``solve_ivp`` RK45 (SMC_example/Micmem_likelihood.py:24-30); this
module is the generic counterpart of what the reference delegates to
SUNDIALS IDA for its stiff flagship (methanation_set_likelihood.py:169) —
but for USER models: any small dense system ``dy/dt = f(t, y, params)``
gets a BDF2 + Newton solve with the same TPU layout contract as the rest
of the framework (batch on the LAST axis, every small-dimension operation
statically unrolled into full-lane-width elementwise ops — see
ops/dae_fast.py for why the vmap-of-small-blocks layout wastes the VPU).

Design (mirrors ops/ode.py's fixed-grid steppers):

- ``lax.scan`` over observation intervals, a static number of BDF
  substeps per interval — static shapes, no data-dependent control flow,
  so the solve fuses into one XLA program, vmaps over particles and
  shards with pjit like everything else.
- Variable-step BDF2 (BDF1 on the very first substep) with the same
  step-ratio coefficients as the methanation march
  (ops/dae_fast.bdf_march_bl), so non-uniform observation grids
  (e.g. log-spaced, the standard shape for stiff kinetics) are natural.
- Full Newton with a static iteration count: the per-lane (n, n)
  Jacobian is built by ``jax.linearize`` tangent passes (n passes, n is
  small) unless the caller supplies an analytic ``jac``; the linear
  solve is the generic unrolled batch-last elimination
  (ops/dae_fast.solve7 — works for any small n).
- Returns the max Newton residual over the whole trajectory so callers
  can mask non-converged particles to -inf log-likelihood (the same
  failure contract as dopri5_grid's embedded error and the reference's
  -10000 sentinel, methanation_set_likelihood.py:244).
- Semi-explicit index-1 DAEs via ``alg_mask``: rows flagged algebraic
  contribute ``0 = f_i(t, y)`` instead of ``dy_i/dt = f_i`` — the same
  differential/algebraic split IDA expresses through ``algvar`` +
  ``suppress_alg`` in the reference (methanation_set_likelihood.py:183-187)
  — and :func:`make_consistent` is the ``make_consistent('IDA_YA_YDP_INIT')``
  analog (:188): a Newton projection of the algebraic components onto the
  constraint manifold with the differential components pinned.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from smc_tpu.ops.dae_fast import solve7


def _build_jac(f, t, y, n):
    """Per-lane Jacobian columns of f at (t, y): list j -> (n, *batch)."""
    _, jvp = jax.linearize(lambda yy: f(t, yy), y)
    cols = []
    for j in range(n):
        e = jnp.zeros_like(y).at[j].set(1.0)
        cols.append(jvp(e))
    return cols


def _diff_mask(alg_mask, n):
    """Static per-row 1.0 (differential) / 0.0 (algebraic) multipliers."""
    if alg_mask is None:
        return [1.0] * n
    m = np.asarray(alg_mask)
    if m.shape != (n,):
        raise ValueError(f"alg_mask shape {m.shape} != ({n},)")
    return [0.0 if bool(a) else 1.0 for a in m]


def _newton_step(f, jac, t, y_iter, alpha, const, h, n, m):
    """One full-Newton update for the BDF system

        G_i(y) = m_i*(alpha*y_i + const_i) - h*f_i(t, y) = 0

    where m_i is the static differential/algebraic row multiplier
    (m_i = 0 turns row i into the scaled algebraic constraint -h*f_i = 0;
    the h scaling keeps the Jacobian A = alpha*diag(m) - h*J uniformly
    conditioned for index-1 systems)."""
    cols = jac(t, y_iter) if jac is not None else _build_jac(f, t, y_iter, n)
    # A = alpha*diag(m) - h*J, batch-last (n, n, *batch).
    A = jnp.stack([
        jnp.stack([alpha * (m[i] if i == j else 0.0) - h * cols[j][i]
                   for j in range(n)])
        for i in range(n)])
    fv = f(t, y_iter)
    g = jnp.stack([m[i] * (alpha * y_iter[i] + const[i]) - h * fv[i]
                   for i in range(n)])
    delta = solve7(A, -g[:, None], pivot=True)[:, 0]
    return y_iter + delta, g


def make_consistent(f: Callable, y0: jnp.ndarray, t0, alg_mask,
                    newton_iters: int = 8, jac: Optional[Callable] = None):
    """Project y0's ALGEBRAIC components onto f_alg(t0, y) = 0.

    The differential components are pinned (Newton rows ``y_i - y0_i = 0``);
    the algebraic rows solve their constraints exactly — the on-device
    equivalent of IDA's ``make_consistent('IDA_YA_YDP_INIT')``
    (reference methanation_set_likelihood.py:188).

    Returns (y0_consistent, resid) where resid is the per-lane max-abs
    algebraic residual after the last iteration, shape ``batch`` — feed it
    to the same divergence mask as the integrator residual.
    """
    n = y0.shape[0]
    m = _diff_mask(alg_mask, n)

    def one(carry, _):
        y, _ = carry
        cols = jac(t0, y) if jac is not None else _build_jac(f, t0, y, n)
        A = jnp.stack([
            jnp.stack([(m[i] * (1.0 if i == j else 0.0)
                        + (1.0 - m[i]) * cols[j][i])
                       for j in range(n)])
            for i in range(n)])
        fv = f(t0, y)
        g = jnp.stack([m[i] * (y[i] - y0[i]) + (1.0 - m[i]) * fv[i]
                       for i in range(n)])
        delta = solve7(A, -g[:, None], pivot=True)[:, 0]
        res = jnp.max(jnp.abs(g), axis=0)
        return (y + delta, res), None

    zero_res = jnp.zeros(y0.shape[1:], y0.dtype)
    (y, res), _ = lax.scan(one, (y0, zero_res), None, length=newton_iters)
    # Residual of the RETURNED iterate (not the pre-update one).
    fv = f(t0, y)
    res = jnp.max(jnp.abs(jnp.stack(
        [(1.0 - m[i]) * fv[i] for i in range(n)])), axis=0)
    return y, res


def bdf2_grid(f: Callable, y0: jnp.ndarray, ts: jnp.ndarray,
              substeps: int = 4, newton_iters: int = 3,
              jac: Optional[Callable] = None, alg_mask=None):
    """Stiff-capable BDF2 on a fixed observation grid.

    f:  (t, y) -> dy/dt with y shaped (n, *batch) — n state components,
        arbitrary trailing batch axes (particles on the last one).
    y0: (n, *batch) initial state at ts[0].
    ts: (T,) observation times, strictly increasing, non-uniform fine.
    jac: optional (t, y) -> [column_0, ..., column_{n-1}] analytic
        Jacobian columns (each (n, *batch)); default builds them with n
        ``jax.linearize`` tangent passes per Newton iteration.
    alg_mask: optional static (n,) bools — True rows are ALGEBRAIC:
        the system is the semi-explicit index-1 DAE
        ``dy_i/dt = f_i`` (mask False) / ``0 = f_i`` (mask True), the
        split IDA expresses via algvar+suppress_alg in the reference
        (methanation_set_likelihood.py:183-187). y0 must be consistent —
        use :func:`make_consistent` first.

    Returns (ys, max_resid): ys (T, n, *batch) with ys[0] == y0, and the
    max-abs Newton residual of the LAST iteration over the whole
    trajectory (scaled by h: resid = |m*(alpha*y + const) - h*f|) — a
    per-batch-lane-reduced scalar-per-lane array of shape batch, usable
    as a divergence mask exactly like dopri5_grid's embedded error.
    """
    n = y0.shape[0]
    m = _diff_mask(alg_mask, n)

    def coeffs(y_n, y_nm1, h, h_prev, is_first):
        # Variable-step BDF2; BDF1 on the first global substep
        # (same formulation as ops/dae_fast.bdf_march_bl).
        r = jnp.where(is_first > 0, 0.0, h / h_prev)
        alpha = (1.0 + 2.0 * r) / (1.0 + r)
        const = -(1.0 + r) * y_n + (r * r / (1.0 + r)) * y_nm1
        return alpha, const

    def substep(carry, inp):
        y_n, y_nm1, h_prev, res_acc = carry
        t1, h, is_first = inp
        alpha, const = coeffs(y_n, y_nm1, h, h_prev, is_first)
        # Linear-extrapolation predictor (exact for is_first: r = 0).
        r = jnp.where(is_first > 0, 0.0, h / h_prev)
        y = y_n + r * (y_n - y_nm1)

        def one(_, y):
            y, _ = _newton_step(f, jac, t1, y, alpha, const, h, n, m)
            return y

        y = lax.fori_loop(0, newton_iters - 1, one, y)
        y, g = _newton_step(f, jac, t1, y, alpha, const, h, n, m)
        res = jnp.max(jnp.abs(g), axis=0)          # (*batch,)
        return (y, y_n, h, jnp.maximum(res_acc, res)), None

    def interval(carry, t_pair):
        t0, t1 = t_pair
        h = (t1 - t0) / substeps
        i = jnp.arange(1, substeps + 1, dtype=y0.dtype)
        t_sub = t0 + i * h
        hs = jnp.full((substeps,), h, y0.dtype)
        y_n, y_nm1, h_prev, res = carry
        firsts = jnp.zeros((substeps,), y0.dtype).at[0].set(
            jnp.where(h_prev == 0.0, 1.0, 0.0))
        (y, y_m, h_last, res), _ = lax.scan(
            substep, (y_n, y_nm1, jnp.where(h_prev == 0.0, h, h_prev), res),
            (t_sub, hs, firsts))
        return (y, y_m, h_last, res), y

    t_pairs = jnp.stack([ts[:-1], ts[1:]], axis=-1)
    zero_res = jnp.zeros(y0.shape[1:], y0.dtype)
    zero_h = jnp.zeros((), y0.dtype)               # sentinel: no step yet
    (_, _, _, res), ys = lax.scan(
        interval, (y0, y0, zero_h, zero_res), t_pairs)
    return jnp.concatenate([y0[None], ys], axis=0), res
