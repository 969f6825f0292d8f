"""Batch-last (lanes-major) DAE engine: the TPU-native hot path.

The straightforward layout — vmap over systems with (7,7) blocks in the
trailing dims — wastes ~94% of each (8,128) VPU tile (the 7x7 block pads to
8x128). This engine transposes the problem: ALL arrays carry the flattened
system batch B = n_particles x n_conditions on the LAST axis, and every
small-dimension operation (7x7 LU, block matmuls, stencils) is statically
unrolled into elementwise ops on (..., B) vectors. Each XLA op then runs at
full lane utilization, and the only sequential structure left is the real
data dependence: time steps x Newton iterations x the NX-long block-Thomas
recurrence.

This is the role the reference delegates to numba-compiled residuals inside
SUNDIALS IDA across 30 Ray worker processes
(methanation_set_likelihood.py:69-139,144-233; methanation_functions.py:84).

Pieces:
- ``solve7``: unrolled Gaussian elimination with (optional) pairwise-swap
  partial pivoting on (7, 7, B) / rhs (7, k, B). No gathers, no XLA LU
  custom call — pure elementwise where/mul/sub chains.
- ``block_thomas_bl``: block-tridiagonal solve, scan over NX.
- ``bdf_march_bl``: BDF1/BDF2 march with per-step Newton; Jacobian blocks
  built by ``jax.linearize`` of the batch-last residual (28 tangent passes:
  4 argument slots x 7 fields).
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax


def _swap_rows(M, R, c, r):
    """Conditionally swap rows c and r so |M[c][c]| is maximal (pairwise)."""
    swap = jnp.abs(M[r][c]) > jnp.abs(M[c][c])
    for j in range(c, len(M)):
        Mc, Mr = M[c][j], M[r][j]
        M[c][j] = jnp.where(swap, Mr, Mc)
        M[r][j] = jnp.where(swap, Mc, Mr)
    for j in range(len(R[0])):
        Rc, Rr = R[c][j], R[r][j]
        R[c][j] = jnp.where(swap, Rr, Rc)
        R[r][j] = jnp.where(swap, Rc, Rr)


def solve7(A: jnp.ndarray, rhs: jnp.ndarray, pivot: bool = True
           ) -> jnp.ndarray:
    """Solve A X = rhs, A (n, n, B), rhs (n, k, B), batch on lanes.

    Statically unrolled; n is small (7 here). Partial pivoting via pairwise
    conditional row swaps (elementwise selects only).
    """
    n = A.shape[0]
    k = rhs.shape[1]
    M = [[A[i, j] for j in range(n)] for i in range(n)]
    R = [[rhs[i, j] for j in range(k)] for i in range(n)]

    for c in range(n):
        if pivot:
            for r in range(c + 1, n):
                _swap_rows(M, R, c, r)
        inv_p = 1.0 / M[c][c]
        for r in range(c + 1, n):
            f = M[r][c] * inv_p
            for j in range(c + 1, n):
                M[r][j] = M[r][j] - f * M[c][j]
            for j in range(k):
                R[r][j] = R[r][j] - f * R[c][j]

    X = [[None] * k for _ in range(n)]
    for c in range(n - 1, -1, -1):
        inv_p = 1.0 / M[c][c]
        for j in range(k):
            acc = R[c][j]
            for cc in range(c + 1, n):
                acc = acc - M[c][cc] * X[cc][j]
            X[c][j] = acc * inv_p
    return jnp.stack([jnp.stack(X[i]) for i in range(n)])


def lu7_nopivot(A: jnp.ndarray) -> jnp.ndarray:
    """In-place LU factorization without pivoting, A (n, n, B) -> combined
    LU (unit-lower L below the diagonal, U on/above). Batch on lanes."""
    n = A.shape[0]
    M = [[A[i, j] for j in range(n)] for i in range(n)]
    for c in range(n):
        inv_p = 1.0 / M[c][c]
        for r in range(c + 1, n):
            f = M[r][c] * inv_p
            M[r][c] = f
            for j in range(c + 1, n):
                M[r][j] = M[r][j] - f * M[c][j]
    return jnp.stack([jnp.stack(M[i]) for i in range(n)])


def lu7_solve(LU: jnp.ndarray, rhs: jnp.ndarray) -> jnp.ndarray:
    """Solve (L U) x = rhs from combined factors. rhs (n, k, B)."""
    n = LU.shape[0]
    k = rhs.shape[1]
    Y = [[rhs[i, j] for j in range(k)] for i in range(n)]
    for c in range(n):           # forward: L y = rhs (unit diagonal)
        for r in range(c + 1, n):
            f = LU[r, c]
            for j in range(k):
                Y[r][j] = Y[r][j] - f * Y[c][j]
    X = [[None] * k for _ in range(n)]
    for c in range(n - 1, -1, -1):  # backward: U x = y
        inv_p = 1.0 / LU[c, c]
        for j in range(k):
            acc = Y[c][j]
            for cc in range(c + 1, n):
                acc = acc - LU[c, cc] * X[cc][j]
            X[c][j] = acc * inv_p
    return jnp.stack([jnp.stack(X[i]) for i in range(n)])


def lu7_solve_T(LU: jnp.ndarray, rhs: jnp.ndarray) -> jnp.ndarray:
    """Solve (L U)^T x = rhs, i.e. U^T L^T x = rhs. rhs (n, k, B)."""
    n = LU.shape[0]
    k = rhs.shape[1]
    Y = [[rhs[i, j] for j in range(k)] for i in range(n)]
    for c in range(n):           # forward: U^T y = rhs (lower tri, diag U)
        inv_p = 1.0 / LU[c, c]
        for j in range(k):
            Y[c][j] = Y[c][j] * inv_p
        for r in range(c + 1, n):
            f = LU[c, r]         # U[c, r] sits above the diagonal
            for j in range(k):
                Y[r][j] = Y[r][j] - f * Y[c][j]
    X = [[None] * k for _ in range(n)]
    for c in range(n - 1, -1, -1):  # backward: L^T x = y (unit diagonal)
        for j in range(k):
            acc = Y[c][j]
            for cc in range(c + 1, n):
                acc = acc - LU[cc, c] * X[cc][j]
            X[c][j] = acc
    return jnp.stack([jnp.stack(X[i]) for i in range(n)])


def block_thomas_factor(A, B, C):
    """Factorization phase of the block-Thomas solve (no pivoting).

    Returns (LUs, ms): per-grid-point LU factors of the Schur-complement
    diagonal blocks and the elimination multipliers, reusable for any number
    of right-hand sides (modified-Newton iterations reuse them).
    """
    def fwd(LU_prev, inp):
        Ai, Bi, Ci_prev = inp
        mT = lu7_solve_T(LU_prev, jnp.swapaxes(Ai, 0, 1))
        m = jnp.swapaxes(mT, 0, 1)
        Bp = Bi - _matmul_bl(m, Ci_prev)
        LU = lu7_nopivot(Bp)
        return LU, (LU, m)

    LU0 = lu7_nopivot(B[0])
    _, (LUs, ms) = lax.scan(fwd, LU0, (A[1:], B[1:], C[:-1]))
    LUs = jnp.concatenate([LU0[None], LUs], axis=0)
    ms = jnp.concatenate([jnp.zeros_like(LU0)[None], ms], axis=0)
    return LUs, ms


def block_thomas_apply(LUs, ms, C, rhs):
    """Solve phase with stored factors: one fwd rhs sweep + one back-sub."""
    def fwd(rp_prev, inp):
        mi, ri = inp
        rp = ri - _matvec_bl(mi, rp_prev)
        return rp, rp

    rp0 = rhs[0]
    _, rps = lax.scan(fwd, rp0, (ms[1:], rhs[1:]))
    rps = jnp.concatenate([rp0[None], rps], axis=0)

    xn = lu7_solve(LUs[-1], rps[-1][:, None, :])[:, 0, :]

    def bwd(x_next, inp):
        LU, rp, Ci = inp
        x = lu7_solve(LU, (rp - _matvec_bl(Ci, x_next))[:, None, :])[:, 0, :]
        return x, x

    _, xs = lax.scan(bwd, xn, (LUs[:-1], rps[:-1], C[:-1]), reverse=True)
    return jnp.concatenate([xs, xn[None]], axis=0)


def _matmul_bl(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(n,m,B) @ (m,k,B) -> (n,k,B): contraction over the small middle dim,
    batch broadcast on lanes (fused multiply-reduce, no dot_general)."""
    return jnp.sum(a[:, :, None, :] * b[None, :, :, :], axis=1)


def _matvec_bl(a: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """(n,m,B) @ (m,B) -> (n,B)."""
    return jnp.sum(a * v[None, :, :], axis=1)


def block_thomas_bl(A, B, C, rhs, pivot: bool = True):
    """Block-tridiagonal solve, batch-last. A/B/C: (NX,7,7,Bt), rhs (NX,7,Bt).

    A[0] and C[-1] must already be folded/zeroed by the caller.
    """
    def fwd(carry, inp):
        Bp_prev, rp_prev = carry
        Ai, Bi, Ci_prev, ri = inp
        # m = A_i inv(Bp_prev):  m^T = solve(Bp_prev^T, A_i^T)
        mT = solve7(jnp.swapaxes(Bp_prev, 0, 1), jnp.swapaxes(Ai, 0, 1),
                    pivot=pivot)
        m = jnp.swapaxes(mT, 0, 1)
        Bp = Bi - _matmul_bl(m, Ci_prev)
        rp = ri - _matvec_bl(m, rp_prev)
        return (Bp, rp), (Bp, rp)

    B0, r0 = B[0], rhs[0]
    _, (Bps, rps) = lax.scan(fwd, (B0, r0), (A[1:], B[1:], C[:-1], rhs[1:]))
    Bps = jnp.concatenate([B0[None], Bps], axis=0)
    rps = jnp.concatenate([r0[None], rps], axis=0)

    xn = solve7(Bps[-1], rps[-1][:, None, :], pivot=pivot)[:, 0, :]

    def bwd(x_next, inp):
        Bp, rp, Ci = inp
        rhs_i = rp - _matvec_bl(Ci, x_next)
        x = solve7(Bp, rhs_i[:, None, :], pivot=pivot)[:, 0, :]
        return x, x

    _, xs = lax.scan(bwd, xn, (Bps[:-1], rps[:-1], C[:-1]), reverse=True)
    return jnp.concatenate([xs, xn[None]], axis=0)


def bdf_march_bl(rows_bl: Callable,
                 y0: jnp.ndarray,
                 dts: jnp.ndarray,
                 newton_iters: int = 3,
                 order: int = 2,
                 pivot: bool = True,
                 analytic_jac: Callable = None,
                 jac_stride: int = 1,
                 n_dense: int = None,
                 reuse_iters: int = None,
                 dense_tail: int = 0) -> jnp.ndarray:
    """March F(y, y') = 0 in batch-last layout. y0: (7, NX, B).

    rows_bl(y_m, y, y_p, yd) -> (7, NX, B) residual rows, where y_m/y_p are
    the neighbor-shifted states (edge-duplicated; the duplicated boundary
    Jacobian contributions are folded into the diagonal blocks here).
    BDF coefficients as in smc_tpu.ops.dae.implicit_euler_dae.

    analytic_jac(y_m, y, y_p, yd) -> {slot: (7, 7, NX, B)} may supply
    closed-form Jacobian blocks for any of the four argument slots
    (0 = y_m, 1 = y, 2 = y_p, 3 = yd); the remaining slots are built with
    jax.linearize tangent passes (7 per slot), so supplying the cheap
    sparse slots (typically y_p and yd) halves the Jacobian cost.

    jac_stride > 1 (modified-Newton path only) enables IDA-style Jacobian
    lag ACROSS time steps — the economy SUNDIALS IDA uses on the reference's
    DAE (methanation_set_likelihood.py:169: one J factorization serves many
    BDF steps). After ``n_dense`` leading per-step-factored steps (default:
    len(dts) % jac_stride), the march proceeds in blocks of ``jac_stride``
    steps: the Jacobian is built and block-Thomas-factored once at block
    entry, and the remaining steps of the block solve with the stale
    factors, each Newton update scaled by IDA's mass-coefficient
    compensation c = 2 / (1 + cj_step / cj_factored) (exactly 1 when the
    step size is constant within the block). Reuse steps run
    ``reuse_iters`` Newton iterations (default newton_iters + 1 — stale
    factors converge linearly rather than quadratically). The residual is
    always evaluated with the step's true coefficients, so a converged
    step is exact regardless of factor staleness.
    """
    nf, nx, bt = y0.shape

    def shift(y):
        y_m = jnp.concatenate([y[:, :1], y[:, :-1]], axis=1)
        y_p = jnp.concatenate([y[:, 1:], y[:, -1:]], axis=1)
        return y_m, y_p

    def residual(y, alpha, const, h):
        y_m, y_p = shift(y)
        yd = (alpha * y + const) / h
        F = rows_bl(y_m, y, y_p, yd)
        return -jnp.moveaxis(F, 1, 0)             # rhs (NX, 7, B)

    def build_blocks(y, alpha, const, h):
        y_m, y_p = shift(y)
        yd = (alpha * y + const) / h

        given = analytic_jac(y_m, y, y_p, yd) if analytic_jac else {}
        need_lin = [s for s in range(4) if s not in given]
        if need_lin:
            F, lin = jax.linearize(rows_bl, y_m, y, y_p, yd)
        else:
            F = rows_bl(y_m, y, y_p, yd)
        # Jacobian blocks: slot s in {y_m, y, y_p, yd} x field f in 0..6 —
        # one tangent pass per (slot, field) gives a block column for all
        # grid points and batch lanes simultaneously; analytic slots skip
        # their 7 passes.
        zeros = jnp.zeros_like(y)
        blocks = dict(given)
        for s in need_lin:
            cols = []
            for f in range(nf):
                tang = [zeros] * 4
                e = jnp.zeros((nf, 1, 1), y0.dtype).at[f, 0, 0].set(1.0)
                tang[s] = jnp.broadcast_to(e, y.shape).astype(y0.dtype)
                cols.append(lin(*tang))          # (7, NX, B)
            blocks[s] = jnp.stack(cols, axis=1)  # (7rows, 7cols, NX, B)
        A_, B_, C_, D_ = blocks[0], blocks[1], blocks[2], blocks[3]
        B_ = B_ + D_ * (alpha / h)
        # (7,7,NX,B) -> (NX,7,7,B) for the scan
        to_scan = lambda M: jnp.moveaxis(M, 2, 0)
        A_, B_, C_ = to_scan(A_), to_scan(B_), to_scan(C_)
        # fold duplicated edge slots
        B_ = B_.at[0].add(A_[0])
        B_ = B_.at[-1].add(C_[-1])
        A_ = A_.at[0].set(0.0)
        C_ = C_.at[-1].set(0.0)
        return A_, B_, C_, -jnp.moveaxis(F, 1, 0)

    def coeffs(y_n, y_nm1, h, h_prev, is_first):
        if order == 2:
            r = jnp.where(is_first > 0, 0.0, h / h_prev)
            alpha = (1.0 + 2.0 * r) / (1.0 + r)
            const = -(1.0 + r) * y_n + (r * r / (1.0 + r)) * y_nm1
        else:
            alpha = jnp.ones((), y0.dtype)
            const = -y_n
        return alpha, const

    def step(carry, inp):
        y_n, y_nm1, h_prev = carry
        h, is_first = inp
        alpha, const = coeffs(y_n, y_nm1, h, h_prev, is_first)

        if pivot:
            # Conservative path: full Newton with pivoted fused Thomas.
            def one_newton(_, y):
                A_, B_, C_, rhs = build_blocks(y, alpha, const, h)
                delta = block_thomas_bl(A_, B_, C_, rhs, pivot=True)
                return y + jnp.moveaxis(delta, 0, 1)

            y = lax.fori_loop(0, newton_iters, one_newton, y_n)
        else:
            # Modified Newton: build + factorize the block-tridiagonal
            # Jacobian ONCE per time step (at the BDF predictor y_n) and
            # reuse the LU factors/multipliers for every iteration — the
            # standard stiff-integrator economy (IDA reuses J across many
            # steps); each extra iteration costs one residual + one
            # fwd/bwd substitution sweep.
            A_, B_, C_, rhs = build_blocks(y_n, alpha, const, h)
            LUs, ms = block_thomas_factor(A_, B_, C_)
            y = y_n + jnp.moveaxis(block_thomas_apply(LUs, ms, C_, rhs),
                                   0, 1)

            def one_more(_, y):
                rhs = residual(y, alpha, const, h)
                delta = block_thomas_apply(LUs, ms, C_, rhs)
                return y + jnp.moveaxis(delta, 0, 1)

            y = lax.fori_loop(0, newton_iters - 1, one_more, y)
        return (y, y_n, h), None

    n_steps = dts.shape[0]
    first = jnp.zeros_like(dts).at[0].set(1.0)
    carry = (y0, y0, dts[0])

    if pivot or jac_stride <= 1:
        (y_final, _, _), _ = lax.scan(step, carry, (dts, first))
        return y_final

    # ---- IDA-style lagged-Jacobian march (modified Newton only) ----------
    n_lag = n_steps - dense_tail
    if n_dense is None:
        n_dense = n_lag % jac_stride
    if (n_lag - n_dense) % jac_stride != 0:
        raise ValueError(f"lagged steps {n_lag - n_dense} not divisible by "
                         f"jac_stride={jac_stride}")
    if reuse_iters is None:
        reuse_iters = newton_iters + 1
    if n_dense:
        carry, _ = lax.scan(step, carry, (dts[:n_dense], first[:n_dense]))
    hs_blk = dts[n_dense:n_lag].reshape(-1, jac_stride)
    first_blk = first[n_dense:n_lag].reshape(-1, jac_stride)

    def apply_(LUs, ms, C_, rhs):
        return jnp.moveaxis(block_thomas_apply(LUs, ms, C_, rhs), 0, 1)

    def predictor(y_n, y_nm1, h, h_prev, is_first):
        # IDA-style polynomial predictor: linear extrapolation of the last
        # two solutions. Cuts the initial Newton residual to O(h^2) — the
        # stale-factor iterations then start inside their convergence basin.
        r = jnp.where(is_first > 0, 0.0, h / h_prev)
        return y_n + r * (y_n - y_nm1)

    def block_step(carry, inp):
        y_n, y_nm1, h_prev = carry
        hs, firsts = inp
        # factor step: build + factor at the predictor, newton_iters updates.
        h = hs[0]
        alpha, const = coeffs(y_n, y_nm1, h, h_prev, firsts[0])
        y0_pred = predictor(y_n, y_nm1, h, h_prev, firsts[0])
        A_, B_, C_, rhs = build_blocks(y0_pred, alpha, const, h)
        LUs, ms = block_thomas_factor(A_, B_, C_)
        cj_f = alpha / h
        y = y0_pred + apply_(LUs, ms, C_, rhs)

        def one_more(_, y):
            return y + apply_(LUs, ms, C_, residual(y, alpha, const, h))

        y = lax.fori_loop(0, newton_iters - 1, one_more, y)
        y_n, y_nm1, h_prev = y, y_n, h
        # reuse steps: stale factors + cj compensation (statically unrolled;
        # jac_stride is small).
        for j in range(1, jac_stride):
            h = hs[j]
            alpha, const = coeffs(y_n, y_nm1, h, h_prev, firsts[j])
            c = 2.0 / (1.0 + (alpha / h) / cj_f)
            y = predictor(y_n, y_nm1, h, h_prev, firsts[j])

            def one_reuse(_, y, alpha=alpha, const=const, h=h, c=c):
                return y + c * apply_(LUs, ms, C_,
                                      residual(y, alpha, const, h))

            y = lax.fori_loop(0, reuse_iters, one_reuse, y)
            y_n, y_nm1, h_prev = y, y_n, h
        return (y_n, y_nm1, h_prev), None

    carry, _ = lax.scan(block_step, carry, (hs_blk, first_blk))
    if dense_tail:
        # Per-step-factored tail: the observable is the final state, so the
        # last steps get fresh factors regardless of the lag economy.
        carry, _ = lax.scan(step, carry, (dts[n_lag:], first[n_lag:]))
    return carry[0]
