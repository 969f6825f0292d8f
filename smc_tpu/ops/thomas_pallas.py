"""Pallas block-Thomas solve sweeps: the DAE march's hot inner solver.

The XLA `lax.scan` formulation of the block-tridiagonal solve pays a
~10 us while-loop iteration tax per block row (docs/PERF.md); even
unrolled-by-6 it leaves the march loop-overhead-bound, and fusing more
work per scan body regresses Mosaic scheduling (the measured-negative
fused-factor and unroll-10 experiments). These kernels remove the loop
machinery entirely.

Two designs, both measured on one v5e chip at the methanation flagship
shape (51, 7, 7, 3840):

- ``block_thomas_apply_tiled``: grid over 128-lane batch tiles, whole NX
  chain per tile in VMEM. 724 us/sweep vs the XLA scan's 1291 us —
  better, but each (7, 128) op is ONE VPU issue with nothing independent
  to hide its latency, so the serial recurrence is op-latency-bound.
- ``block_thomas_apply_pl`` (default): ONE program over the full batch —
  every vector op spans B lanes (B/128 independent lane-tiles pipeline
  through the VPU inside the serial NX recurrence) while rows of the
  factor arrays stream through double-buffered VMEM windows via manual
  async DMA. Mosaic constraint: DMA-sliced rows must be sublane-aligned,
  so the block row axis is padded 7 -> 8 (``pad_factors`` does it once
  per factorization; the march reuses padded factors across all
  modified-Newton iterations).

Replaces the role SUNDIALS IDA's banded direct solver plays in the
reference (methanation_set_likelihood.py:169,186); numerics are
identical to ops.dae_fast.block_thomas_apply up to fp32 reassociation
(~4e-5 relative against a float64 oracle, same as the XLA path).

Layout contract (CLAUDE.md): the system batch B is the LAST (lane) axis
of every array; the small block algebra is statically unrolled python.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128
_SUB = 8     # sublane alignment for DMA-sliced rows


def _mv(m, v, nf, out_rows):
    """(nf, nf_pad, L) block times (>=nf, L) vector -> (out_rows, L),
    statically unrolled; rows beyond nf are zero-padded."""
    rows = []
    for r in range(nf):
        acc = m[r, 0] * v[0]
        for c in range(1, nf):
            acc = acc + m[r, c] * v[c]
        rows.append(acc)
    for _ in range(nf, out_rows):
        rows.append(jnp.zeros_like(rows[0]))
    return jnp.stack(rows)


def _sub(a, b, nf, out_rows):
    """Row-wise a - b on the first nf rows, zero-padded to out_rows."""
    rows = [a[r] - b[r] for r in range(nf)]
    for _ in range(nf, out_rows):
        rows.append(jnp.zeros_like(rows[0]))
    return jnp.stack(rows)


def _lu_solve(lu, t, nf, out_rows):
    """Solve (L U) x = t from combined factors (unit lower L), t (>=nf, L).
    Same operation order as ops.dae_fast.lu7_solve (k=1)."""
    y = [t[r] for r in range(nf)]
    for c in range(nf):
        for r in range(c + 1, nf):
            y[r] = y[r] - lu[r, c] * y[c]
    x = [None] * nf
    for c in range(nf - 1, -1, -1):
        acc = y[c]
        for cc in range(c + 1, nf):
            acc = acc - lu[c, cc] * x[cc]
        x[c] = acc * (1.0 / lu[c, c])
    for _ in range(nf, out_rows):
        x.append(jnp.zeros_like(x[0]))
    return jnp.stack(x)


# ---------------------------------------------------------------------------
# Lane-tiled kernel (kept for narrow batches / as the measured baseline)
# ---------------------------------------------------------------------------
def _apply_kernel(lu_ref, m_ref, c_ref, r_ref, x_ref, rp_ref, *, nf):
    nx = lu_ref.shape[0]

    rp0 = r_ref[0]
    rp_ref[0] = rp0

    def fwd(i, prev):
        rp = _sub(r_ref[i], _mv(m_ref[i], prev, nf, nf), nf, nf)
        rp_ref[i] = rp
        return rp

    last = jax.lax.fori_loop(1, nx, fwd, rp0)

    xn = _lu_solve(lu_ref[nx - 1], last, nf, nf)
    x_ref[nx - 1] = xn

    def bwd(k, x_next):
        i = nx - 2 - k
        t = _sub(rp_ref[i], _mv(c_ref[i], x_next, nf, nf), nf, nf)
        xi = _lu_solve(lu_ref[i], t, nf, nf)
        x_ref[i] = xi
        return xi

    jax.lax.fori_loop(0, nx - 1, bwd, xn)


@functools.partial(jax.jit, static_argnames=("interpret",))
def block_thomas_apply_tiled(LUs, ms, C, rhs, interpret: bool = False):
    """Lane-tiled Pallas solve: see module docstring for the measured
    latency-bound verdict vs the streaming kernel."""
    nx, nf, _, b = LUs.shape
    if b % _LANE:
        from smc_tpu.ops.dae_fast import block_thomas_apply
        return block_thomas_apply(LUs, ms, C, rhs)
    n_tiles = b // _LANE

    blk4 = pl.BlockSpec((nx, nf, nf, _LANE), lambda i: (0, 0, 0, i),
                        memory_space=pltpu.VMEM)
    blk3 = pl.BlockSpec((nx, nf, _LANE), lambda i: (0, 0, i),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_apply_kernel, nf=nf),
        grid=(n_tiles,),
        in_specs=[blk4, blk4, blk4, blk3],
        out_specs=blk3,
        out_shape=jax.ShapeDtypeStruct(rhs.shape, rhs.dtype),
        scratch_shapes=[pltpu.VMEM((nx, nf, _LANE), jnp.float32)],
        interpret=interpret,
    )(LUs, ms, C, rhs)


# ---------------------------------------------------------------------------
# Streaming kernel (full batch per op, factor rows DMA'd behind compute)
# ---------------------------------------------------------------------------
def pad_factors(LUs, ms, C):
    """Pad the block ROW axis (second-minor once on device) 7 -> 8 so DMA
    row slices are sublane-aligned. Do this ONCE per factorization — the
    march reuses the padded factors for every modified-Newton apply."""
    nf = LUs.shape[1]
    pad = (-nf) % _SUB
    if pad == 0:
        return LUs, ms, C
    cfg = ((0, 0), (0, 0), (0, pad), (0, 0))
    return (jnp.pad(LUs, cfg), jnp.pad(ms, cfg), jnp.pad(C, cfg))


def _stream_kernel(lu_hbm, m_hbm, c_hbm, r_hbm, x_hbm,
                   lu_buf, m_buf, c_buf, r_buf, x_buf, rp_ref,
                   lu_sem, m_sem, c_sem, r_sem, x_sem, *, nf):
    nx = lu_hbm.shape[0]
    nfp = r_hbm.shape[1]

    def cp(src, dst, sem):
        return pltpu.make_async_copy(src, dst, sem)

    # ---- forward: rp[i] = r[i] - ms[i] @ rp[i-1] -------------------------
    cp(r_hbm.at[0], r_buf.at[0], r_sem.at[0]).start()
    cp(m_hbm.at[1], m_buf.at[1], m_sem.at[1]).start()
    cp(r_hbm.at[1], r_buf.at[1], r_sem.at[1]).start()

    cp(r_hbm.at[0], r_buf.at[0], r_sem.at[0]).wait()
    rp = r_buf[0]
    rp_ref[0] = rp

    def fwd(i, rp):
        slot = i % 2
        nxt = (i + 1) % 2

        @pl.when(i + 1 < nx)
        def _():
            cp(m_hbm.at[i + 1], m_buf.at[nxt], m_sem.at[nxt]).start()
            cp(r_hbm.at[i + 1], r_buf.at[nxt], r_sem.at[nxt]).start()

        cp(m_hbm.at[i], m_buf.at[slot], m_sem.at[slot]).wait()
        cp(r_hbm.at[i], r_buf.at[slot], r_sem.at[slot]).wait()
        rp = _sub(r_buf[slot], _mv(m_buf[slot], rp, nf, nfp), nf, nfp)
        rp_ref[i] = rp
        return rp

    jax.lax.fori_loop(1, nx, fwd, rp)

    # ---- backward: x[i] = LU[i]^-1 (rp[i] - C[i] @ x[i+1]) ---------------
    last = nx - 1
    cp(lu_hbm.at[last], lu_buf.at[last % 2], lu_sem.at[last % 2]).start()
    cp(lu_hbm.at[last - 1], lu_buf.at[(last - 1) % 2],
       lu_sem.at[(last - 1) % 2]).start()
    cp(c_hbm.at[last - 1], c_buf.at[(last - 1) % 2],
       c_sem.at[(last - 1) % 2]).start()

    cp(lu_hbm.at[last], lu_buf.at[last % 2], lu_sem.at[last % 2]).wait()
    x = _lu_solve(lu_buf[last % 2], rp_ref[last], nf, nfp)
    x_buf[last % 2] = x
    cp(x_buf.at[last % 2], x_hbm.at[last], x_sem.at[last % 2]).start()

    def bwd(k, x):
        i = nx - 2 - k
        slot = i % 2

        @pl.when(i - 1 >= 0)
        def _():
            nxt = (i - 1) % 2
            cp(lu_hbm.at[i - 1], lu_buf.at[nxt], lu_sem.at[nxt]).start()
            cp(c_hbm.at[i - 1], c_buf.at[nxt], c_sem.at[nxt]).start()

        cp(lu_hbm.at[i], lu_buf.at[slot], lu_sem.at[slot]).wait()
        cp(c_hbm.at[i], c_buf.at[slot], c_sem.at[slot]).wait()
        t = _sub(rp_ref[i], _mv(c_buf[slot], x, nf, nfp), nf, nfp)
        xi = _lu_solve(lu_buf[slot], t, nf, nfp)

        # the x DMA two rows up used this slot's x_buf; let it drain before
        # overwriting (no DMA was issued on this slot yet when i + 2 >= nx)
        @pl.when(i + 2 < nx)
        def _():
            cp(x_buf.at[slot], x_hbm.at[i + 2], x_sem.at[slot]).wait()

        x_buf[slot] = xi
        cp(x_buf.at[slot], x_hbm.at[i], x_sem.at[slot]).start()
        return xi

    jax.lax.fori_loop(0, nx - 1, bwd, x)
    # drain the final two x DMAs (issued at i = 1 and i = 0)
    cp(x_buf.at[0], x_hbm.at[0], x_sem.at[0]).wait()
    cp(x_buf.at[1], x_hbm.at[1], x_sem.at[1]).wait()


# ---------------------------------------------------------------------------
# Streaming factorization kernel
# ---------------------------------------------------------------------------
def _lu_cols(Mc, nf, rowgt):
    """Doolittle LU in COLUMN-stacked form: Mc is a list over columns of
    (nf, B) values; returns combined LU columns in place. Each elimination
    step is a handful of (nf, B) vector ops instead of ~nf^2 scalar-lane
    ops — the kernel is per-op issue-bound, so fewer/fatter ops win."""
    for c in range(nf):
        piv_inv = 1.0 / Mc[c][c]
        f = jnp.where(rowgt[c], Mc[c] * piv_inv[None], Mc[c])
        Mc[c] = f
        lcol = jnp.where(rowgt[c], f, 0.0)
        for j in range(c + 1, nf):
            Mc[j] = Mc[j] - lcol * Mc[j][c][None]
    return Mc


def _factor_row(lu_prev, Aval, Bval, Cval, nf, nfp, rowgt):
    """One block-Thomas factor row in column form:
    m = A @ LU_prev^{-1}; Bp = B - m @ C_prev; LU = lu(Bp).
    Returns (lu_val, m_val), both (nf, nfp, B) with zero pad columns."""
    inv = [1.0 / lu_prev[c, c] for c in range(nf)]
    w = []
    for c in range(nf):                      # w U = A, columns ascending
        acc = Aval[:, c]
        for k in range(c):
            acc = acc - w[k] * lu_prev[k, c][None]
        w.append(acc * inv[c][None])
    m = [None] * nf
    for c in range(nf - 1, -1, -1):          # m L = w, columns descending
        acc = w[c]
        for k in range(c + 1, nf):
            acc = acc - m[k] * lu_prev[k, c][None]
        m[c] = acc
    m_cols = m + [jnp.zeros_like(m[0])] * (nfp - nf)
    m_val = jnp.stack(m_cols, axis=1)        # (nf, nfp, B)
    acc = Bval                               # Bp by rank-1 updates over k
    for k in range(nf):
        acc = acc - m_val[:, k][:, None, :] * Cval[k][None, :, :]
    Mc = _lu_cols([acc[:, c] for c in range(nf)], nf, rowgt)
    lu_val = jnp.stack(Mc + [jnp.zeros_like(Mc[0])] * (nfp - nf), axis=1)
    return lu_val, m_val


def _factor_kernel(a_hbm, b_hbm, c_hbm, lu_hbm, m_hbm,
                   a_buf, b_buf, c_buf, lu_buf, m_buf,
                   a_sem, b_sem, c_sem, lu_sem, m_sem, *, nf):
    nx = a_hbm.shape[0]
    nfp = a_hbm.shape[2]
    row = jax.lax.broadcasted_iota(jnp.int32, (nf, 1), 0)
    rowgt = [row > c for c in range(nf)]

    def cp(src, dst, sem):
        return pltpu.make_async_copy(src, dst, sem)

    # row 0: LU0 = lu(B[0]), m0 = 0; prefetch row 1's A/B and C[0]
    cp(b_hbm.at[0], b_buf.at[0], b_sem.at[0]).start()
    cp(a_hbm.at[1], a_buf.at[1], a_sem.at[1]).start()
    cp(b_hbm.at[1], b_buf.at[1], b_sem.at[1]).start()
    cp(c_hbm.at[0], c_buf.at[1], c_sem.at[1]).start()

    cp(b_hbm.at[0], b_buf.at[0], b_sem.at[0]).wait()
    B0 = b_buf[0]
    Mc0 = _lu_cols([B0[:, c] for c in range(nf)], nf, rowgt)
    lu_val = jnp.stack(Mc0 + [jnp.zeros_like(Mc0[0])] * (nfp - nf), axis=1)
    lu_buf[0] = lu_val
    m_buf[0] = jnp.zeros_like(lu_val)
    cp(lu_buf.at[0], lu_hbm.at[0], lu_sem.at[0]).start()
    cp(m_buf.at[0], m_hbm.at[0], m_sem.at[0]).start()

    def body(i, lu_prev):
        slot = i % 2
        nxt = (i + 1) % 2

        @pl.when(i + 1 < nx)
        def _():
            cp(a_hbm.at[i + 1], a_buf.at[nxt], a_sem.at[nxt]).start()
            cp(b_hbm.at[i + 1], b_buf.at[nxt], b_sem.at[nxt]).start()
            cp(c_hbm.at[i], c_buf.at[nxt], c_sem.at[nxt]).start()

        cp(a_hbm.at[i], a_buf.at[slot], a_sem.at[slot]).wait()
        cp(b_hbm.at[i], b_buf.at[slot], b_sem.at[slot]).wait()
        cp(c_hbm.at[i - 1], c_buf.at[slot], c_sem.at[slot]).wait()

        lu_val, m_val = _factor_row(lu_prev, a_buf[slot], b_buf[slot],
                                    c_buf[slot], nf, nfp, rowgt)

        # the output DMAs issued two rows up used these slots; drain first
        @pl.when(i - 2 >= 0)
        def _():
            cp(lu_buf.at[slot], lu_hbm.at[i - 2], lu_sem.at[slot]).wait()
            cp(m_buf.at[slot], m_hbm.at[i - 2], m_sem.at[slot]).wait()

        lu_buf[slot] = lu_val
        m_buf[slot] = m_val
        cp(lu_buf.at[slot], lu_hbm.at[i], lu_sem.at[slot]).start()
        cp(m_buf.at[slot], m_hbm.at[i], m_sem.at[slot]).start()
        return lu_val

    jax.lax.fori_loop(1, nx, body, lu_val)
    # drain the final two output rows (nx-2 on slot nx%2, nx-1 on (nx-1)%2)
    cp(lu_buf.at[nx % 2], lu_hbm.at[nx - 2], lu_sem.at[nx % 2]).wait()
    cp(m_buf.at[nx % 2], m_hbm.at[nx - 2], m_sem.at[nx % 2]).wait()
    cp(lu_buf.at[(nx - 1) % 2], lu_hbm.at[nx - 1],
       lu_sem.at[(nx - 1) % 2]).wait()
    cp(m_buf.at[(nx - 1) % 2], m_hbm.at[nx - 1],
       m_sem.at[(nx - 1) % 2]).wait()


def pad_blocks(A, B, C):
    """Column-pad raw (NX, nf, nf, B) block arrays to (NX, nf, _SUB, B) so
    the factor kernel's row DMAs are sublane-aligned."""
    nf = A.shape[1]
    pad = (-nf) % _SUB
    if pad == 0:
        return A, B, C
    cfg = ((0, 0), (0, 0), (0, pad), (0, 0))
    return jnp.pad(A, cfg), jnp.pad(B, cfg), jnp.pad(C, cfg)


@functools.partial(jax.jit, static_argnames=("interpret",))
def block_thomas_factor_pl(A, B, C, interpret: bool = False):
    """Streaming Pallas block-Thomas factorization: same recurrence as
    ops.dae_fast.block_thomas_factor (LU of the Schur-complement diagonal
    blocks + elimination multipliers), one kernel instead of an NX-length
    XLA scan of ~300 micro-ops per row.

    Returns (LUs, ms, C_p), ALL column-padded to (NX, nf, 8, B) — exactly
    what both ``block_thomas_apply`` (value slices fuse the pad away) and
    ``block_thomas_apply_pl`` consume. Falls back to the XLA scan (then
    pads) off-TPU or for unaligned batches.
    """
    nx, nf = A.shape[0], A.shape[1]
    b = A.shape[3]
    if A.shape[2] == nf:
        A, B, C = pad_blocks(A, B, C)
    nfp = A.shape[2]
    if (b % _LANE or nx < 2
            or (not interpret and jax.default_backend() != "tpu")):
        from smc_tpu.ops.dae_fast import block_thomas_factor
        LUs, ms = block_thomas_factor(A[:, :, :nf], B[:, :, :nf],
                                      C[:, :, :nf])
        cfg = ((0, 0), (0, 0), (0, nfp - nf), (0, 0))
        return jnp.pad(LUs, cfg), jnp.pad(ms, cfg), C

    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    row4 = (2, nf, nfp, b)
    out_sh = jax.ShapeDtypeStruct((nx, nf, nfp, b), A.dtype)
    LUs, ms = pl.pallas_call(
        functools.partial(_factor_kernel, nf=nf),
        in_specs=[any_spec] * 3,
        out_specs=[any_spec] * 2,
        out_shape=[out_sh, out_sh],
        # The row loop's live block values (~6 small matrices of (B,)
        # lanes) exceed Mosaic's default 16 MB scoped-VMEM stack at the
        # flagship B=3840; v5e has 128 MB of VMEM.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        scratch_shapes=[
            pltpu.VMEM(row4, jnp.float32),   # A window
            pltpu.VMEM(row4, jnp.float32),   # B window
            pltpu.VMEM(row4, jnp.float32),   # C window
            pltpu.VMEM(row4, jnp.float32),   # LU out window
            pltpu.VMEM(row4, jnp.float32),   # m out window
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(A, B, C)
    return LUs, ms, C


@functools.partial(jax.jit, static_argnames=("interpret",))
def block_thomas_apply_pl(LUs, ms, C, rhs, interpret: bool = False):
    """Streaming Pallas solve phase with stored factors; same contract as
    ops.dae_fast.block_thomas_apply. LUs/ms/C (NX, nf, nf_pad, B) — pass
    ``pad_factors`` output, or raw (nf == nf_pad) factors which are then
    padded here per call — rhs (NX, nf, B), B a multiple of 128; returns
    x (NX, nf, B).

    VMEM high-water at (51, 7, 8, 3840): rp (NX, 8, B) 6.3 MB + three
    2-row factor windows 5.0 MB + r/x row windows 0.5 MB ~= 12 MB.
    """
    nx, nf = rhs.shape[0], rhs.shape[1]
    b = rhs.shape[2]
    if (b % _LANE or nx < 2
            or (not interpret and jax.default_backend() != "tpu")):
        # XLA fallback (non-TPU backends, unaligned batches): consumes the
        # unpadded factor rows.
        from smc_tpu.ops.dae_fast import block_thomas_apply
        return block_thomas_apply(LUs[:, :, :nf], ms[:, :, :nf],
                                  C[:, :, :nf], rhs)
    if LUs.shape[2] == nf:
        LUs, ms, C = pad_factors(LUs, ms, C)
    nfp = LUs.shape[2]

    rhs_p = jnp.pad(rhs, ((0, 0), (0, nfp - nf), (0, 0))) \
        if nfp != nf else rhs

    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    row4 = (2, nf, nfp, b)
    row3 = (2, nfp, b)
    x_p = pl.pallas_call(
        functools.partial(_stream_kernel, nf=nf),
        in_specs=[any_spec] * 4,
        out_specs=any_spec,
        out_shape=jax.ShapeDtypeStruct(rhs_p.shape, rhs.dtype),
        scratch_shapes=[
            pltpu.VMEM(row4, jnp.float32),   # lu window
            pltpu.VMEM(row4, jnp.float32),   # ms window
            pltpu.VMEM(row4, jnp.float32),   # c window
            pltpu.VMEM(row3, jnp.float32),   # r window
            pltpu.VMEM(row3, jnp.float32),   # x out window
            pltpu.VMEM((nx, nfp, b), jnp.float32),  # rp (whole sweep)
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(LUs, ms, C, rhs_p)
    return x_p[:, :nf] if nfp != nf else x_p
