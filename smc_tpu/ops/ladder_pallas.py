"""Pallas γ-ladder statistics: the SMC step's dominant fixed cost.

``find_gamma`` (smc/kernels.py) evaluates the ESS of every candidate
tempering exponent in a geometric shrink ladder (the reference's
sequential shrink loop, Micmem_SMC_main.py:109-144, flattened). As an XLA
fusion the (K, N) exp + two lane-axis row-reductions measured **878 us per
SMC step** at K=81, N=1e5 on one v5e chip — ~25x its compute bound (the
fusion re-materializes exp lanes per reduction and reduces along the minor
axis). This kernel streams d_ll through VMEM once and accumulates the two
per-candidate sums elementwise into VMEM-resident (K, tile) accumulators —
no (K, N) intermediate, no minor-axis reduction, one kernel per step.

    s1[k] = sum_i exp(d_ll[i] * dg[k])          (sum of weights)
    s2[k] = sum_i exp(d_ll[i] * dg[k])^2        (sum of squared weights)

Normalized ESS = s1^2 / (s2 * N) is formed by the (tiny) caller.

Layout contract (CLAUDE.md): the particle axis is the wide axis of every
op — d_ll tiles are (SUB*ROWS, LANE) blocks, the K ladder candidates are
the statically-unrolled short axis. Failed-particle sentinels (-inf
log-lik) contribute exp(-inf * dg) = 0 exactly, as in the jnp path; the
padding tail reuses the same identity.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128
_ROWS = 64          # sublanes per grid tile -> 64*128 = 8192 particles/step


def _ladder_kernel(dg_ref, d_ref, s1_ref, s2_ref, *, K):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        s1_ref[...] = jnp.zeros_like(s1_ref)
        s2_ref[...] = jnp.zeros_like(s2_ref)

    d = d_ref[0]                                  # (ROWS, LANE)
    for k in range(K):                            # static unroll (K ~ 81)
        w = jnp.exp(d * dg_ref[k])
        s1_ref[k] += w
        s2_ref[k] += w * w


def _ladder_stats_jnp(d_ll, dgammas):
    """XLA formulation (any backend, any batching): (..., N) x (..., K)."""
    w = jnp.exp(d_ll[..., None, :] * dgammas[..., :, None])
    return jnp.sum(w, axis=-1), jnp.sum(w * w, axis=-1)


def _ladder_stats_pallas(d_ll, dgammas, interpret: bool):
    K = dgammas.shape[0]
    n = d_ll.shape[0]
    tile = _ROWS * _LANE
    t = -(-n // tile)
    d = jnp.pad(d_ll, (0, t * tile - n), constant_values=-jnp.inf)
    d = d.reshape(t, _ROWS, _LANE)

    out_sh = jax.ShapeDtypeStruct((K, _ROWS, _LANE), jnp.float32)
    s1, s2 = pl.pallas_call(
        functools.partial(_ladder_kernel, K=K),
        grid=(t,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, _ROWS, _LANE), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((K, _ROWS, _LANE), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, _ROWS, _LANE), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[out_sh, out_sh],
        interpret=interpret,
    )(dgammas.astype(jnp.float32), d.astype(jnp.float32))
    return jnp.sum(s1, axis=(1, 2)), jnp.sum(s2, axis=(1, 2))


@jax.custom_batching.custom_vmap
def _ladder_stats_kernel(d_ll, dgammas):
    return _ladder_stats_pallas(d_ll, dgammas, interpret=False)


@_ladder_stats_kernel.def_vmap
def _ladder_stats_kernel_vmap(axis_size, in_batched, d_ll, dgammas):
    """Batched rule (the hierarchical ensemble vmaps the SMC step over a
    population axis, smc/ensemble.py): Mosaic can't tile the per-
    population SMEM ladder operand, so batched calls use the XLA
    formulation — the ladder is a per-STEP cost amortized over all B*N
    lanes, so the kernel's advantage is already diluted by B here."""
    d_b, g_b = in_batched
    if not d_b:
        d_ll = jnp.broadcast_to(d_ll, (axis_size,) + d_ll.shape)
    if not g_b:
        dgammas = jnp.broadcast_to(dgammas, (axis_size,) + dgammas.shape)
    return _ladder_stats_jnp(d_ll, dgammas), (True, True)


@functools.partial(jax.jit, static_argnames=("interpret",))
def ladder_stats(d_ll, dgammas, interpret: bool = False):
    """Per-candidate weight sums of the tempering ladder in ONE pass.

    d_ll: (N,) log_lik - max(log_lik) (<= 0, may contain -inf).
    dgammas: (K,) candidate increments gamma_k - gamma_old (> 0).
    Returns (s1, s2): each (K,) float32, summed over all N particles.

    Off-TPU (and for interpret-mode tests) the jnp formulation is used;
    under a sharded jit the Pallas call makes XLA gather d_ll — the sums
    are cheap relative to a sharded likelihood sweep, and the CPU-mesh
    test path never enters the kernel. Under vmap (ensemble populations)
    the custom batching rule above selects the XLA formulation.
    """
    if interpret:
        return _ladder_stats_pallas(d_ll, dgammas, interpret=True)
    if jax.default_backend() != "tpu":
        return _ladder_stats_jnp(d_ll, dgammas)
    return _ladder_stats_kernel(d_ll, dgammas)
