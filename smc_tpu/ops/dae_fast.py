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

# Unroll factor for the NX-axis block-Thomas scans: merging several block
# rows per loop iteration amortizes the TPU while-loop iteration tax over
# more VPU work. Measured on one v5e chip (chunk-128 methanation march):
# 1 -> ~1300 pps, 6 -> ~1530 pps, 10 -> ~1140 (I-cache/scheduling falls
# over). Static under jit; see docs/PERF.md.
_NX_UNROLL = 6

# Array-form block LU/solves inside the Thomas sweeps (lu7_*_arr): measured
# experiment flag, read at trace time (benchmarks/ab_lu_arr.py).
_LU_ARR = False


def _lu_f(Bp):
    return lu7_nopivot_arr(Bp) if _LU_ARR else lu7_nopivot(Bp)


def _lu_s(LU, r):
    return lu7_solve_arr(LU, r) if _LU_ARR else lu7_solve(LU, r)


def _lu_sT(LU, r):
    return lu7_solve_T_arr(LU, r) if _LU_ARR else lu7_solve_T(LU, r)


# Fuse the block-Thomas factorization's forward sweep with the first
# right-hand side's forward sweep (one scan instead of two per factor
# step). MEASURED NEGATIVE on v5e (benchmarks/ab_fused_factor.py,
# interleaved same-process A/B: fused 1348/1355 pps vs separate 1556/1560)
# — the fatter scan body hurts Mosaic scheduling more than the saved scan
# launch, the same pathology as _NX_UNROLL=10. Kept as a trace-time flag so
# the experiment stays reproducible on future hardware.
_FUSED_FACTOR = False

# Store the block-Thomas factors (LUs, ms, C) in bfloat16 between the
# factor and apply phases: halves factor HBM re-reads on the Jacobian-lag
# reuse steps at the cost of bf16<->f32 converts inside the apply scan
# bodies (and ~3 decimal digits of solve accuracy — modified Newton
# tolerates an approximate solve, the convergence masks still gate on the
# fp32 residual). Trace-time experiment flag (benchmarks/ab_bf16_factors.py).
_BF16_FACTORS = False


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


def lu7_nopivot_arr(A: jnp.ndarray) -> jnp.ndarray:
    """Array-form of ``lu7_nopivot``: identical arithmetic per entry, but
    each elimination step is ~3 wide (n, n, B) ops instead of ~n^2
    lane-width ops — the small-op-scheduling experiment of
    benchmarks/ab_lu_arr.py (PERF.md pins the march as bound by op
    scheduling, not FLOPs; trading 12.5% sublane padding of the n=7 axis
    for ~20x fewer op issues). Toggle with ``_LU_ARR``."""
    n = A.shape[0]
    rows = jnp.arange(n)
    M = A
    for c in range(n):
        inv_p = 1.0 / M[c, c]                                  # (B,)
        f = jnp.where((rows > c)[:, None], M[:, c] * inv_p, 0.0)  # (n, B)
        colmask = (rows > c).astype(M.dtype)[:, None]          # cols > c
        M = M - f[:, None, :] * (M[c] * colmask)[None]
        M = M.at[:, c].set(jnp.where((rows > c)[:, None], f, M[:, c]))
    return M


def lu7_solve_arr(LU: jnp.ndarray, rhs: jnp.ndarray) -> jnp.ndarray:
    """Array-form of ``lu7_solve`` (column-sweep substitution; summation
    order differs from the loop form by fp reassociation only)."""
    n = LU.shape[0]
    rows = jnp.arange(n)
    Y = rhs                                                    # (n, k, B)
    for c in range(n):            # L y = rhs (unit diagonal)
        fcol = jnp.where((rows > c)[:, None], LU[:, c], 0.0)   # (n, B)
        Y = Y - fcol[:, None, :] * Y[c][None]
    X = jnp.zeros_like(Y)
    for c in range(n - 1, -1, -1):  # U x = y
        xc = Y[c] / LU[c, c]
        X = X.at[c].set(xc)
        ucol = jnp.where((rows < c)[:, None], LU[:, c], 0.0)
        Y = Y - ucol[:, None, :] * xc[None]
    return X


def lu7_solve_T_arr(LU: jnp.ndarray, rhs: jnp.ndarray) -> jnp.ndarray:
    """Array-form of ``lu7_solve_T``: U^T y = rhs then L^T x = y."""
    n = LU.shape[0]
    rows = jnp.arange(n)
    Y = rhs
    for c in range(n):            # U^T y = rhs (lower tri, diag from U)
        yc = Y[c] / LU[c, c]
        Y = Y.at[c].set(yc)
        f = jnp.where((rows > c)[:, None], LU[c], 0.0)  # LU[c, r], r > c
        Y = Y - f[:, None, :] * yc[None]
    X = jnp.zeros_like(Y)
    for c in range(n - 1, -1, -1):  # L^T x = y (unit diagonal)
        xc = Y[c]
        X = X.at[c].set(xc)
        lrow = jnp.where((rows < c)[:, None], LU[c], 0.0)  # L[c, r], r < c
        Y = Y - lrow[:, None, :] * xc[None]
    return X


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


def lu7_pivot(A: jnp.ndarray):
    """Partial-pivoting LU with a STORED permutation: A (n, n, B) ->
    (LU, P) with P A = L U, P a one-hot (n, n, B) permutation matrix.

    Pairwise conditional swaps of FULL rows (including the computed L
    columns — LAPACK-style, so the factors replay on any rhs). Needed where
    raw diagonal blocks may be structurally unpivotable (e.g. the outlet
    boundary block couples u/T as a pure 2x2 permutation); the solve costs
    one extra matvec (y = P rhs) over the no-pivot path.
    """
    n = A.shape[0]
    M = [[A[i, j] for j in range(n)] for i in range(n)]
    eye = jnp.eye(n, dtype=A.dtype)
    P = [[jnp.broadcast_to(eye[i, j], A.shape[2:]) for j in range(n)]
         for i in range(n)]
    for c in range(n):
        for r in range(c + 1, n):
            swap = jnp.abs(M[r][c]) > jnp.abs(M[c][c])
            for j in range(n):
                Mc, Mr = M[c][j], M[r][j]
                M[c][j] = jnp.where(swap, Mr, Mc)
                M[r][j] = jnp.where(swap, Mc, Mr)
                Pc, Pr = P[c][j], P[r][j]
                P[c][j] = jnp.where(swap, Pr, Pc)
                P[r][j] = jnp.where(swap, Pc, Pr)
        inv_p = 1.0 / M[c][c]
        for r in range(c + 1, n):
            f = M[r][c] * inv_p
            M[r][c] = f
            for j in range(c + 1, n):
                M[r][j] = M[r][j] - f * M[c][j]
    LU = jnp.stack([jnp.stack(M[i]) for i in range(n)])
    Pm = jnp.stack([jnp.stack(P[i]) for i in range(n)])
    return LU, Pm


def lu7_pivot_solve(LU, P, rhs):
    """Solve with lu7_pivot factors: x = U^-1 L^-1 P rhs. rhs (n, k, B)."""
    pr = jnp.sum(P[:, :, None, :] * rhs[None, :, :, :], axis=1)
    return lu7_solve(LU, pr)


def block_thomas_factor(A, B, C):
    """Factorization phase of the block-Thomas solve (no pivoting).

    Returns (LUs, ms): per-grid-point LU factors of the Schur-complement
    diagonal blocks and the elimination multipliers, reusable for any number
    of right-hand sides (modified-Newton iterations reuse them).
    """
    def fwd(LU_prev, inp):
        Ai, Bi, Ci_prev = inp
        mT = _lu_sT(LU_prev, jnp.swapaxes(Ai, 0, 1))
        m = jnp.swapaxes(mT, 0, 1)
        Bp = Bi - _matmul_bl(m, Ci_prev)
        LU = _lu_f(Bp)
        return LU, (LU, m)

    # NOTE: a "concat-free" variant (full-length scan, identity LU carry +
    # C carried through the loop) was measured ~19% SLOWER end-to-end on
    # v5e than these two output concatenates — scanned inputs pipeline,
    # carried blocks serialize. Keep the concats.
    LU0 = _lu_f(B[0])
    _, (LUs, ms) = lax.scan(fwd, LU0, (A[1:], B[1:], C[:-1]),
                            unroll=_NX_UNROLL)
    LUs = jnp.concatenate([LU0[None], LUs], axis=0)
    ms = jnp.concatenate([jnp.zeros_like(LU0)[None], ms], axis=0)
    return LUs, ms


def block_thomas_factor_apply(A, B, C, rhs):
    """Fused factorization + first solve.

    The factor's forward sweep and the first right-hand side's forward
    sweep share one scan over NX (they consume the same elimination
    multipliers the moment they are produced), saving one NX-length scan
    launch per factor step. MEASURED SLOWER than separate sweeps as the
    march solver (see _FUSED_FACTOR) — off by default. Returns
    ((LUs, ms), x) with factors reusable by ``block_thomas_apply`` for
    subsequent right-hand sides.
    """
    def fwd(carry, inp):
        LU_prev, rp_prev = carry
        Ai, Bi, Ci_prev, ri = inp
        mT = _lu_sT(LU_prev, jnp.swapaxes(Ai, 0, 1))
        m = jnp.swapaxes(mT, 0, 1)
        Bp = Bi - _matmul_bl(m, Ci_prev)
        LU = _lu_f(Bp)
        rp = ri - _matvec_bl(m, rp_prev)
        return (LU, rp), (LU, m, rp)

    LU0 = _lu_f(B[0])
    rp0 = rhs[0]
    _, (LUs, ms, rps) = lax.scan(fwd, (LU0, rp0),
                                 (A[1:], B[1:], C[:-1], rhs[1:]),
                                 unroll=_NX_UNROLL)
    LUs = jnp.concatenate([LU0[None], LUs], axis=0)
    ms = jnp.concatenate([jnp.zeros_like(LU0)[None], ms], axis=0)
    rps = jnp.concatenate([rp0[None], rps], axis=0)

    xn = _lu_s(LUs[-1], rps[-1][:, None, :])[:, 0, :]

    def bwd(x_next, inp):
        LU, rp, Ci = inp
        x = _lu_s(LU, (rp - _matvec_bl(Ci, x_next))[:, None, :])[:, 0, :]
        return x, x

    _, xs = lax.scan(bwd, xn, (LUs[:-1], rps[:-1], C[:-1]),
                     reverse=True, unroll=_NX_UNROLL)
    return (LUs, ms), jnp.concatenate([xs, xn[None]], axis=0)


def block_thomas_apply(LUs, ms, C, rhs):
    """Solve phase with stored factors: one fwd rhs sweep + one back-sub.

    Accepts column-padded factors (nf, nfp>=nf, B) blocks as produced by
    the Pallas factor kernel (thomas_pallas.block_thomas_factor_pl): the
    pad columns are dropped by value slices inside the scan bodies, which
    fuse into the block algebra (no materialized copies).

    Factors narrower than rhs (the _BF16_FACTORS experiment) are cast
    back per-slice INSIDE the scan bodies, so HBM reads stay at the
    stored width and only the live block widens."""
    cast = ((lambda M: M.astype(rhs.dtype)) if LUs.dtype != rhs.dtype
            else (lambda M: M))
    nf = rhs.shape[1]
    # Column-padded factors (Pallas factor kernel output) are consumed by
    # carrying the sweep vectors at the padded width with zero tail rows —
    # the pad columns multiply zeros, exactly. Slicing the scanned blocks
    # instead ([:, :nf]) materializes a per-iteration block copy; the pads
    # vanish at trace time for unpadded factors.
    ext = ms.shape[2] - nf
    wide = (lambda v: jnp.pad(v, ((0, ext), (0, 0)))) if ext \
        else (lambda v: v)

    def fwd(rp_prev, inp):
        mi, ri = inp
        rp = ri - _matvec_bl(cast(mi), rp_prev)
        return wide(rp), rp

    rp0 = rhs[0]
    _, rps = lax.scan(fwd, wide(rp0), (ms[1:], rhs[1:]), unroll=_NX_UNROLL)
    rps = jnp.concatenate([rp0[None], rps], axis=0)

    xn = _lu_s(cast(LUs[-1]), rps[-1][:, None, :])[:, 0, :]

    def bwd(x_next, inp):
        LU, rp, Ci = inp
        x = _lu_s(cast(LU), (rp - _matvec_bl(cast(Ci), x_next))[:, None, :]
                  )[:, 0, :]
        return wide(x), x

    _, xs = lax.scan(bwd, wide(xn), (LUs[:-1], rps[:-1], C[:-1]),
                     reverse=True, unroll=_NX_UNROLL)
    return jnp.concatenate([xs, xn[None]], axis=0)


def block_thomas_babe_factor(A, B, C):
    """Twisted ("burn-at-both-ends") block-Thomas factorization.

    The standard factor sweep is an NX-deep serial chain; PERF.md measures
    the march as bound by fixed per-scan-iteration costs, so chain DEPTH —
    not FLOPs — is the binding constraint. BABE eliminates from BOTH ends
    simultaneously, the two recurrences meeting at row k = NX//2: each
    scan iteration processes one top row and one bottom row as a single
    lane-stacked (7,7,2B) block op (the identical algebra with A and C
    roles swapped for the upward direction), halving the serial depth at
    equal total FLOPs and doubling the lane width per iteration.

    Head blocks are solved with full partial pivoting (``solve7``): the
    raw boundary blocks need it — the outlet BC rows make B[NX-1] a
    row-permuted identity whose no-pivot LU divides by zero (the forward
    Thomas sweep only ever factors Schur-updated blocks, which is why the
    classic direction never notices). The interior Schur complements of
    BOTH chains are no-pivot safe (measured on the flagship blocks:
    every leading principal minor well-conditioned), so the scans keep
    the cheap unrolled no-pivot LU.

    Requires NX odd (the flagship grid is NX=51,
    methanation_set_conditon.py:17) so the two chains are equal length.
    Returns an opaque factor pytree for ``block_thomas_babe_apply``;
    reusable across right-hand sides (modified-Newton factor lag).
    """
    nx = A.shape[0]
    if nx % 2 == 0:
        raise ValueError(f"babe solver requires odd NX, got {nx}")
    k = nx // 2
    cat = lambda t, b: jnp.concatenate([t, b], axis=-1)  # noqa: E731
    swapT = lambda M: jnp.swapaxes(M, 0, 1)              # noqa: E731

    # peeled head eliminations (pivoted): m_1 = A_1 B0^{-1},
    # w_{nx-2} = C_{nx-2} B_{nx-1}^{-1}, via the transpose systems
    m1 = swapT(solve7(swapT(B[0]), swapT(A[1]), pivot=True))
    w1 = swapT(solve7(swapT(B[-1]), swapT(C[nx - 2]), pivot=True))
    m_head = cat(m1, w1)
    Bp1 = B[1] - _matmul_bl(m1, C[0])
    Bq1 = B[nx - 2] - _matmul_bl(w1, A[nx - 1])
    LU_init = _lu_f(cat(Bp1, Bq1))

    # stacked interior: top rows 2..k-1 | bottom rows nx-3..k+1
    X = cat(A[2:k], C[nx - 3:k:-1])
    Bs = cat(B[2:k], B[nx - 3:k:-1])
    Y = cat(C[1:k - 1], A[nx - 2:k + 1:-1])

    def fwd(LU_prev, inp):
        Xi, Bi, Yi = inp
        m = swapT(_lu_sT(LU_prev, swapT(Xi)))
        Bp = Bi - _matmul_bl(m, Yi)
        LU = _lu_f(Bp)
        return LU, (LU, m)

    LU_last, (LUs, ms) = lax.scan(fwd, LU_init, (X, Bs, Y),
                                  unroll=_NX_UNROLL)
    # rows 1..k-1 | nx-2..k+1
    LU_all = jnp.concatenate([LU_init[None], LUs], axis=0)

    # meeting-row epilogue: both chains eliminate into row k
    bsz = A.shape[-1]
    mk = swapT(_lu_sT(LU_last, swapT(cat(A[k], C[k]))))      # m_k | w_k
    corr = _matmul_bl(mk, cat(C[k - 1], A[k + 1]))
    LUk = _lu_f(B[k] - corr[:, :, :bsz] - corr[:, :, bsz:])

    # back-substitution couplings: interior C_{k-1}..C_1 | A_{k+1}..A_{nx-2}
    G = cat(jnp.flip(C[1:k], axis=0), A[k + 1:nx - 1])
    # heads for the peeled final step (pivoted solve at apply time)
    heads = (B[0], B[-1], C[0], A[-1])
    return LU_all, ms, m_head, mk, LUk, G, heads


def block_thomas_babe_apply(fac, rhs):
    """Solve with stored BABE factors: both forward rhs sweeps run as one
    half-depth lane-stacked scan, then the meeting-row solve, then both
    outward back-substitutions as one more half-depth scan (pivoted
    peeled steps at the two boundary rows). Results match
    ``block_thomas_apply`` to fp32 reassociation."""
    LU_all, ms, m_head, mk, LUk, G, heads = fac
    B0, Bn, C0, An = heads
    nx = rhs.shape[0]
    k = nx // 2
    bsz = rhs.shape[-1]
    cat = lambda t, b: jnp.concatenate([t, b], axis=-1)  # noqa: E731

    # peeled head step of the forward sweeps
    r_head = cat(rhs[0], rhs[-1])                        # r_0 | r_{nx-1}
    rp1 = cat(rhs[1], rhs[nx - 2]) - _matvec_bl(m_head, r_head)
    r_stack = cat(rhs[2:k], rhs[nx - 3:k:-1])

    def fwd(rp_prev, inp):
        mi, ri = inp
        rp = ri - _matvec_bl(mi, rp_prev)
        return rp, rp

    rp_last, rps = lax.scan(fwd, rp1, (ms, r_stack), unroll=_NX_UNROLL)
    # rows 1..k-1 | nx-2..k+1
    rps_all = jnp.concatenate([rp1[None], rps], axis=0)

    corr = _matvec_bl(mk, rp_last)
    rk = rhs[k] - corr[:, :bsz] - corr[:, bsz:]
    xk = _lu_s(LUk, rk[:, None, :])[:, 0, :]

    def bwd(x_prev, inp):
        LUt, rpt, Gt = inp
        x = _lu_s(LUt, (rpt - _matvec_bl(Gt, x_prev))[:, None, :])[:, 0, :]
        return x, x

    x_last, xs = lax.scan(bwd, cat(xk, xk),
                          (LU_all[::-1], rps_all[::-1], G),
                          unroll=_NX_UNROLL)
    # xs[t] = x_{k-1-t} | x_{k+1+t}, covering rows k-1..1 | k+1..nx-2
    # peeled boundary rows (pivoted): x_0 and x_{nx-1}
    x1 = x_last[:, :bsz]                                 # x_1
    xm = x_last[:, bsz:]                                 # x_{nx-2}
    x0 = solve7(B0, (rhs[0] - _matvec_bl(C0, x1))[:, None, :],
                pivot=True)[:, 0, :]
    xn = solve7(Bn, (rhs[-1] - _matvec_bl(An, xm))[:, None, :],
                pivot=True)[:, 0, :]
    x_top = jnp.flip(xs[:, :, :bsz], axis=0)             # x_1..x_{k-1}
    x_bot = xs[:, :, bsz:]                               # x_{k+1}..x_{nx-2}
    return jnp.concatenate([x0[None], x_top, xk[None], x_bot, xn[None]],
                           axis=0)


def _matmul_bl(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(n,m,B) @ (m,k,B) -> (n,k,B): contraction over the small middle dim,
    batch broadcast on lanes (fused multiply-reduce, no dot_general)."""
    return jnp.sum(a[:, :, None, :] * b[None, :, :, :], axis=1)


def _matvec_bl(a: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """(n,m,B) @ (m,B) -> (n,B)."""
    return jnp.sum(a * v[None, :, :], axis=1)


# --------------------------------------------------------------------------
# Block cyclic reduction: log-depth alternative to the block-Thomas scan.
#
# The Thomas solve is a 2xNX-deep chain of small block ops whose only wide
# axis is the lane batch; PERF.md measures the march as dependency-bound,
# not FLOP- or HBM-bound. Cyclic reduction trades ~2-3x the block FLOPs for
# ~8x fewer sequential stages (2*log2(NX) vs 2*NX): at each level all
# EVEN-indexed rows are eliminated simultaneously (each substituted into
# its two odd neighbors), recursing on the odd rows — a system of size
# (m-1)/2, which stays 2^j - 1 when NX is padded to 2^k - 1 with decoupled
# identity blocks (safe: the caller already zeroes A[0] and C[-1], so the
# pad boundary has no coupling terms).
# --------------------------------------------------------------------------

_blu_piv = jax.vmap(lu7_pivot)                    # (m,7,7,B) -> (LU, P)
_bsolve_piv = jax.vmap(lu7_pivot_solve)           # ((m,..LU,P),(m,7,k,B))
_blu_np = jax.vmap(lu7_nopivot)
_bsolve_np = jax.vmap(lu7_solve)


def _blu(Bm, pivot):
    return _blu_piv(Bm) if pivot else (_blu_np(Bm), None)


def _bsolve(LUP, r):
    LU, P = LUP
    if P is None:
        return _bsolve_np(LU, r)
    return _bsolve_piv(LU, P, r)


def _bsolve_vec(LUP, r):
    return _bsolve(LUP, r[:, :, None, :])[:, :, 0, :]


_bmm = jax.vmap(_matmul_bl)                        # (m,7,7,B)x(m,7,7,B)
_bmv = jax.vmap(_matvec_bl)                        # (m,7,7,B)x(m,7,B)


def _cr_pad(A, B, C, nx):
    """Pad the row axis to m = 2^k - 1 with decoupled identity blocks."""
    m = 1
    while m < nx:
        m = 2 * m + 1
    if m == nx:
        return A, B, C, m
    pad = m - nx
    eye = jnp.broadcast_to(jnp.eye(B.shape[1], dtype=B.dtype)[:, :, None],
                           (pad,) + B.shape[1:])
    zero = jnp.zeros((pad,) + A.shape[1:], A.dtype)
    return (jnp.concatenate([A, zero]), jnp.concatenate([B, eye]),
            jnp.concatenate([C, zero]), m)


def block_cr_factor(A, B, C):
    """Cyclic-reduction factorization of a block-tridiagonal system.

    A/B/C: (NX, n, n, Bt) with A[0] == 0 and C[-1] == 0 (caller-folded,
    same contract as block_thomas_factor). Returns an opaque factor pytree
    for ``block_cr_apply`` — per level the eliminated (even-row) LUs and
    propagators P = inv(B)A, Q = inv(B)C plus the surviving odd rows'
    original off-diagonals, and the root LU. No pivoting (the
    modified-Newton economy path already runs pivot-free).
    """
    nx = A.shape[0]
    A, B, C, m = _cr_pad(A, B, C, nx)
    levels = []
    level = 0
    while m > 1:
        # even rows 0,2,..,m-1 are eliminated; odd rows 1,3,..,m-2 survive.
        # Level 0 factors RAW diagonal blocks, which may be structurally
        # unpivotable (the outlet boundary block is a pure u/T permutation)
        # -> stored-pivot LU. Deeper levels factor Schur-updated blocks with
        # mass/coupling fill-in -> no-pivot LU (graph ~6x smaller; validated
        # against block_thomas on prior-region draws in the tests).
        A_ev, B_ev, C_ev = A[0::2], B[0::2], C[0::2]
        A_od, B_od, C_od = A[1::2], B[1::2], C[1::2]
        LUP = _blu(B_ev, pivot=(level == 0))
        P = _bsolve(LUP, A_ev)                     # inv(B_i) A_i
        Q = _bsolve(LUP, C_ev)                     # inv(B_i) C_i
        levels.append((LUP, P, Q, A_od, C_od))
        # Surviving row 2p+1 couples to eliminated rows 2p (P[p], Q[p]) and
        # 2p+2 (P[p+1], Q[p+1]):  x_even = s - P x_left - Q x_right.
        A = -_bmm(A_od, P[:-1])
        C = -_bmm(C_od, Q[1:])
        B = B_od - _bmm(A_od, Q[:-1]) - _bmm(C_od, P[1:])
        m = A.shape[0]
        level += 1
    root = lu7_pivot(B[0])
    return (tuple(levels), root)


def block_cr_apply(factors, rhs):
    """Solve with stored cyclic-reduction factors. rhs (NX, n, Bt)."""
    levels, root = factors
    nx = rhs.shape[0]
    m = levels[0][0][0].shape[0] * 2 - 1 if levels else 1
    if m != nx:
        rhs = jnp.concatenate(
            [rhs, jnp.zeros((m - nx,) + rhs.shape[1:], rhs.dtype)])
    r = rhs
    stash = []
    for LUP, P, Q, A_od, C_od in levels:
        s = _bsolve_vec(LUP, r[0::2])
        stash.append(s)
        r = r[1::2] - _bmv(A_od, s[:-1]) - _bmv(C_od, s[1:])
    x = lu7_pivot_solve(root[0], root[1], r[0][:, None, :])[:, 0, :][None]
    for (LUP, P, Q, _, _), s in zip(reversed(levels), reversed(stash)):
        z = jnp.zeros_like(x[:1])
        x_ev = (s - _bmv(P, jnp.concatenate([z, x]))
                - _bmv(Q, jnp.concatenate([x, z])))
        inter = jnp.stack([x_ev[:-1], x], axis=1)
        x = jnp.concatenate([inter.reshape((-1,) + x.shape[1:]),
                             x_ev[-1:]])
    return x[:nx]


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
    _, (Bps, rps) = lax.scan(fwd, (B0, r0), (A[1:], B[1:], C[:-1], rhs[1:]),
                             unroll=_NX_UNROLL)
    Bps = jnp.concatenate([B0[None], Bps], axis=0)
    rps = jnp.concatenate([r0[None], rps], axis=0)

    xn = solve7(Bps[-1], rps[-1][:, None, :], pivot=pivot)[:, 0, :]

    def bwd(x_next, inp):
        Bp, rp, Ci = inp
        rhs_i = rp - _matvec_bl(Ci, x_next)
        x = solve7(Bp, rhs_i[:, None, :], pivot=pivot)[:, 0, :]
        return x, x

    _, xs = lax.scan(bwd, xn, (Bps[:-1], rps[:-1], C[:-1]),
                     reverse=True, unroll=_NX_UNROLL)
    return jnp.concatenate([xs, xn[None]], axis=0)


def resolve_solver(solver: str) -> str:
    """Resolve the "auto" solver choice at trace time.

    "auto" -> the plain XLA block-Thomas scan everywhere: the streaming
    Pallas factor/apply kernels ("thomas_pl", ops/thomas_pallas.py) win
    their microbenches (factor 1.65 -> ~1.1 ms, apply 1.26 -> 0.67 ms at
    the flagship shape) but measured ~6% SLOWER end-to-end on v5e
    (1500 vs 1604 particles/s) — the march's XLA sweeps fuse with the
    surrounding Jacobian builds, while the opaque kernels force padded
    materialization at their boundaries. Kept as an explicit opt-in for
    re-evaluation on larger NX / other chips."""
    if solver == "auto":
        return "thomas"
    return solver


def _newton_kit(rows_bl: Callable, y0: jnp.ndarray, pivot: bool,
                analytic_jac: Callable, solver: str):
    """Shared closures for the implicit solvers: residual evaluation,
    Jacobian block assembly, and the solver-dispatched block-tridiagonal
    factor/apply pair. The BDF mass term is parameterized as
    yd = (alpha*y + const)/h; alpha=0, const=0 selects the steady system
    F(y, 0). Returns (shift, residual, build_blocks, factor_, apply_,
    factor_apply_)."""
    nf, nx, bt = y0.shape
    # thomas_pl consumes column-padded (nf, 8, ...) blocks (sublane-aligned
    # row DMAs); emit the pad at block-assembly time so no standalone pad
    # copies appear between the build and the factor kernel.
    pad_cols = ((-nf) % 8) if (solver == "thomas_pl" and not pivot) else 0

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
            cols += [jnp.zeros_like(cols[0])] * pad_cols
            blocks[s] = jnp.stack(cols, axis=1)  # (7rows, ncols, NX, B)
        if pad_cols:
            # analytic slots that were not emitted pre-padded
            for s, blk in blocks.items():
                if blk.shape[1] == nf:
                    blocks[s] = jnp.pad(
                        blk, ((0, 0), (0, pad_cols), (0, 0), (0, 0)))
        A_, B_, C_, D_ = blocks[0], blocks[1], blocks[2], blocks[3]
        B_ = B_ + D_ * (alpha / h)
        # (7,ncol,NX,B) -> (NX,7,ncol,B) for the scan; XLA fuses this
        # transpose into the scans' consumption (a scan-major assembly
        # upstream measured slower — see methanation._analytic_full_jac).
        to_scan = lambda M: jnp.moveaxis(M, 2, 0)
        A_, B_, C_ = to_scan(A_), to_scan(B_), to_scan(C_)
        # fold duplicated edge slots
        B_ = B_.at[0].add(A_[0])
        B_ = B_.at[-1].add(C_[-1])
        A_ = A_.at[0].set(0.0)
        C_ = C_.at[-1].set(0.0)
        return A_, B_, C_, -jnp.moveaxis(F, 1, 0)

    def factor_(A_, B_, C_):
        # solver="cr": log-depth cyclic reduction; "thomas": sequential scan;
        # "thomas_pl": ONE streaming Pallas kernel instead of the scan's
        # ~300 micro-ops per grid row (the march's dominant fixed cost —
        # measured 1.65 ms -> Pallas per factor sweep at the flagship
        # shape). The applies stay on the XLA scan, which already runs at
        # the HBM floor and consumes the kernel's column-padded factors
        # via fused value slices.
        if solver == "cr":
            return block_cr_factor(A_, B_, C_)
        if solver == "babe":
            return block_thomas_babe_factor(A_, B_, C_)
        if solver == "thomas_pl":
            from smc_tpu.ops.thomas_pallas import block_thomas_factor_pl
            return block_thomas_factor_pl(A_, B_, C_)
        LUs, ms = block_thomas_factor(A_, B_, C_)
        if _BF16_FACTORS:
            return (LUs.astype(jnp.bfloat16), ms.astype(jnp.bfloat16),
                    C_.astype(jnp.bfloat16))
        return (LUs, ms, C_)

    def apply_(fac, rhs):
        if solver == "cr":
            delta = block_cr_apply(fac, rhs)
        elif solver == "babe":
            delta = block_thomas_babe_apply(fac, rhs)
        else:
            LUs, ms, C_ = fac
            delta = block_thomas_apply(LUs, ms, C_, rhs)
        return jnp.moveaxis(delta, 0, 1)

    def factor_apply_(A_, B_, C_, rhs):
        """Factor + first solve; fused forward sweep on the Thomas path."""
        if solver in ("cr", "babe") or not _FUSED_FACTOR:
            fac = factor_(A_, B_, C_)
            return fac, apply_(fac, rhs)
        (LUs, ms), delta = block_thomas_factor_apply(A_, B_, C_, rhs)
        return (LUs, ms, C_), jnp.moveaxis(delta, 0, 1)

    return shift, residual, build_blocks, factor_, apply_, factor_apply_


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
                 dense_tail: int = 0,
                 solver: str = "thomas") -> jnp.ndarray:
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
    solver = resolve_solver(solver)
    _, residual, build_blocks, factor_, apply_, factor_apply_ = _newton_kit(
        rows_bl, y0, pivot, analytic_jac, solver)

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
            # reuse the factors for every iteration — the standard
            # stiff-integrator economy (IDA reuses J across many steps);
            # each extra iteration costs one residual + one solve sweep.
            A_, B_, C_, rhs = build_blocks(y_n, alpha, const, h)
            fac, delta = factor_apply_(A_, B_, C_, rhs)
            y = y_n + delta

            def one_more(_, y):
                return y + apply_(fac, residual(y, alpha, const, h))

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
        fac, delta = factor_apply_(A_, B_, C_, rhs)
        cj_f = alpha / h
        y = y0_pred + delta

        def one_more(_, y):
            return y + apply_(fac, residual(y, alpha, const, h))

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
                return y + c * apply_(fac, residual(y, alpha, const, h))

            y = lax.fori_loop(0, reuse_iters, one_reuse, y)
            y_n, y_nm1, h_prev = y, y_n, h
        return (y_n, y_nm1, h_prev), None

    carry, _ = lax.scan(block_step, carry, (hs_blk, first_blk))
    if dense_tail:
        # Per-step-factored tail: the observable is the final state, so the
        # last steps get fresh factors regardless of the lag economy.
        carry, _ = lax.scan(step, carry, (dts[n_lag:], first[n_lag:]))
    return carry[0]


def steady_march_bl(rows_bl: Callable,
                    y0: jnp.ndarray,
                    n_steps: int = 20,
                    h0: float = 0.02,
                    h_max: float = 1e6,
                    grow_cap: float = 6.0,
                    grow_floor: float = 2.0,
                    lag: int = 1,
                    reuse_iters: int = 2,
                    newton_iters: int = 1,
                    pivot: bool = False,
                    analytic_jac: Callable = None,
                    solver: str = "thomas",
                    conv_tol: float = 1e-4) -> jnp.ndarray:
    """Solve the steady state F(y, yd=0) = 0 directly. y0: (7, NX, B).

    Pseudo-transient continuation with per-lane switched-evolution
    relaxation (SER): each BDF1 pseudo-step solves
    ``F(y', (y' - y)/h) = 0`` by modified Newton from the predictor y —
    i.e. Levenberg-regularized Newton on the steady system with damping
    D/h — and each LANE's h evolves by the classic SER rule
    ``h_k = h_{k-1} * ||F(y_{k-1}, 0)|| / ||F(y_k, 0)||`` (clipped to
    [1/4, grow_cap], capped at h_max). Lanes are independent reactor
    systems, so per-lane h costs nothing in this layout: h is a (B,)
    vector broadcast into the mass term. As a lane's residual collapses,
    its h rockets to h_max and the iteration becomes plain Newton —
    quadratic convergence to the exact t -> inf state, no separate
    polish phase.

    The steady residual norm driving SER is free: at the BDF1 predictor,
    yd = (y - y)/h = 0, so the rhs ``build_blocks`` already returns IS
    -F(y, 0).

    This replaces the whole transient march when the observable is the
    endpoint of a long integration: the reference integrates its reactor
    to tfinal=75 with IDA and reads only the final outlet state
    (methanation_set_likelihood.py:191-233) — a steady-state observable.
    SER-PTC reaches it in ~3x fewer implicit steps than the
    time-accurate BDF2 schedule, with zero time-discretization error.

    Failure containment: lanes not converged at the last step
    (steady-residual norm above ``conv_tol`` relative to the lane's
    initial residual norm, or non-finite) are set to NaN, so callers'
    -10000 sentinels fire exactly as for a SUNDIALS failure in the
    reference (:244). A lane whose step produces non-finite values keeps
    its previous iterate and retries at h/4 — SER's built-in rejection.
    """
    solver = resolve_solver(solver)
    _, residual, build_blocks, factor_, apply_, factor_apply_ = _newton_kit(
        rows_bl, y0, pivot, analytic_jac, solver)

    one = jnp.ones((), y0.dtype)
    bt = y0.shape[-1]
    tiny = jnp.asarray(1e-30, y0.dtype)

    def lane_norm(rhs):                           # rhs (NX, 7, B)
        return jnp.max(jnp.abs(rhs), axis=(0, 1))

    def step(carry, _):
        y, h, r_prev = carry
        A_, B_, C_, rhs = build_blocks(y, one, -y, h)   # rhs = -F(y, 0)
        r = lane_norm(rhs)                              # (B,)
        fac, delta = factor_apply_(A_, B_, C_, rhs)
        y1 = y + delta

        def one_more(_, yk):
            return yk + apply_(fac, residual(yk, one, -y, h))

        y1 = lax.fori_loop(0, newton_iters - 1, one_more, y1)
        # Jacobian lag (the march's IDA economy, in PTC form): lag-1 more
        # BDF1 steps at the SAME h reuse the factors — equal h means the
        # factored mass coefficient is exact (cj ratio 1, no compensation
        # needed); only the J(y) part is stale, the standard modified-
        # Newton trade. h then grows by grow_floor^lag per scan iteration,
        # preserving the per-implicit-step growth rate.
        for _ in range(1, lag):
            base = y1

            def one_reuse(_, yk, base=base):
                return yk + apply_(fac, residual(yk, one, -base, h))

            y1 = lax.fori_loop(0, reuse_iters, one_reuse, y1)
        bad = ~jnp.isfinite(jnp.max(jnp.abs(y1), axis=(0, 1)))   # (B,)
        ratio = jnp.clip(r_prev / jnp.maximum(r, tiny),
                         0.25, grow_cap ** lag)
        # Growth floor: pure SER stalls on this problem's long ignition
        # plateau (the residual norm is nearly constant for most of the
        # 6-decade pseudo-time traverse, so ratio ~= 1 and h never grows).
        # While the step is healthy (residual not growing), advance at
        # least geometrically — PTC needs no time accuracy, only Newton
        # stability; SER then takes over when the residual starts falling.
        ratio = jnp.where(ratio > 0.9,
                          jnp.maximum(ratio, grow_floor ** lag), ratio)
        h_next = jnp.where(bad, h * 0.25,
                           jnp.minimum(h * ratio, h_max))
        y_next = jnp.where(bad[None, None, :], y, y1)
        return (y_next, h_next, r), None

    h_init = jnp.full((bt,), h0, y0.dtype)
    r0 = lane_norm(residual(y0, one, -y0, one))          # = |F(y0, 0)|
    (y, h, r_last), _ = lax.scan(step, (y0, h_init, r0),
                                 None, length=n_steps)

    # Convergence certificate: final steady residual small relative to the
    # lane's initial residual (r0 also fixes the per-lane unit scale).
    r_end = lane_norm(residual(y, one, -y, one))
    ok = jnp.isfinite(r_end) & (r_end < conv_tol * (r0 + 1.0))
    return jnp.where(ok[None, None, :], y, jnp.nan)
