"""Batched small-matrix linear solves, TPU-native.

``jnp.linalg.solve`` lowers to LAPACK-style LU custom calls that are a poor
fit for huge batches of tiny (7x7) systems on TPU (and are the only
non-jnp-expressible op in the whole DAE path). This module implements
Gaussian elimination with partial pivoting as pure vectorized jnp ops with a
statically unrolled elimination loop: every step is elementwise/gather work
on the batch axis, so XLA fuses the entire solve into a handful of VPU
kernels. Used by the block-tridiagonal Thomas solver (smc_tpu/ops/dae.py),
i.e. the innermost kernel of the methanation likelihood (the role numba's
LLVM-compiled ``reaction`` + SUNDIALS' dense solves play in the reference,
methanation_set_likelihood.py:69-139,169).
"""
from __future__ import annotations

import jax.numpy as jnp


def solve_small(A: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve A x = b for small static n with partial pivoting.

    A: (..., n, n), b: (..., n) or (..., n, k). Batched over leading dims.
    """
    vec = b.ndim == A.ndim - 1
    if vec:
        b = b[..., None]
    n = A.shape[-1]
    M = jnp.concatenate([A, b], axis=-1)          # (..., n, n+k)
    rows_iota = jnp.arange(n)

    for k in range(n):
        # Partial pivot: row with max |M[.., j, k]| among j >= k.
        col = jnp.abs(M[..., :, k])
        col = jnp.where(rows_iota >= k, col, -jnp.inf)
        p = jnp.argmax(col, axis=-1)              # (...,)
        # Swap rows k <-> p (batched permutation gather).
        pk = p[..., None]
        perm = jnp.where(rows_iota == k, pk,
                         jnp.where(rows_iota == pk, k, rows_iota))
        M = jnp.take_along_axis(M, perm[..., None], axis=-2)
        # Eliminate below the pivot.
        piv = M[..., k, k][..., None]              # (..., 1)
        factor = M[..., :, k] / jnp.where(piv == 0, 1e-30, piv)
        mask = (rows_iota > k).astype(M.dtype)
        M = M - (mask * factor)[..., None] * M[..., k:k + 1, :]

    # Back substitution (unrolled).
    x = jnp.zeros_like(M[..., n:])
    for k in range(n - 1, -1, -1):
        rhs = M[..., k, n:] - jnp.einsum("...j,...jk->...k",
                                         M[..., k, k + 1:n], x[..., k + 1:, :])
        piv = M[..., k, k][..., None]
        xk = rhs / jnp.where(piv == 0, 1e-30, piv)
        x = x.at[..., k, :].set(xk)

    return x[..., 0] if vec else x
