"""Explicit cross-shard residual-systematic resampling (shard_map).

The default path lets XLA's SPMD partitioner distribute the global-view
kernel (smc_tpu.smc.kernels); this module is the hand-scheduled equivalent
with every collective explicit, for meshes where the partitioner's choices
need overriding and as executable documentation of the distributed
algorithm:

- one shared uniform draw v0 (same key on every shard);
- the residual prefix sum in EXACT chunked-int32 arithmetic (the same
  quantization as the single-chip kernel, smc_tpu.smc.kernels._QBITS):
  per-shard local inclusive cumsums of the residual chunks, lifted to the
  global prefix sum by exclusive-over-shards integer offsets (all_gather of
  int32 shard totals — ICI). Integer addition is associative, so the counts
  are BITWISE identical to the single-chip kernel at any N — no fp32 drift,
  no 2^24 exactness cliff;
- the total-count repair applied at the GLOBAL argmax-weight particle
  (first occurrence), exactly the single-chip kernel's policy;
- slot offsets by the identical exclusive-prefix trick over int32 count
  totals (exact up to N < 2^31);
- the particle exchange as an all_gather of the (small) particle block +
  local gather — the explicit form of the cross-shard gather the XLA path
  emits.

Matches smc_tpu.smc.kernels.residual_systematic_resample + take bitwise
(same draw, same integer arithmetic; tested in tests/test_sharding.py at
n=1024 and tests/test_sharding_large.py at n=2^24, counts only).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from smc_tpu.parallel.mesh import PARTICLE_AXIS
from smc_tpu.smc.kernels import _grid_from_pieces, _residual_pieces, _QBITS


def _exclusive_shard_offset(local_total: jnp.ndarray, axis: str):
    """Exclusive prefix sum of a per-shard scalar over the mesh axis
    (dtype-preserving: int32 totals stay int32 — exact)."""
    idx = jax.lax.axis_index(axis)
    n_shards = jax.lax.axis_size(axis)
    # all_gather the shard totals (tiny) and mask below our index.
    totals = jax.lax.all_gather(local_total, axis)          # (S,)
    zero = jnp.zeros((), totals.dtype)
    return jnp.sum(jnp.where(jnp.arange(n_shards) < idx, totals, zero))


def resample_counts_sharded_fn(n: int, ax: str = PARTICLE_AXIS):
    """Per-shard body computing residual-systematic offspring counts for a
    shard-distributed weight vector (global length n). Returns the local
    counts block; bitwise-equal to the single-chip kernel's counts."""

    def counts_local(key, w_l):
        idx = jax.lax.axis_index(ax)

        v0 = jax.random.uniform(key, ())            # same draw on all shards
        v0q = jnp.floor(v0 * (1 << _QBITS)).astype(jnp.int32)

        scaled = w_l * n
        det = jnp.floor(scaled)
        resid = scaled - det

        pieces, cb = _residual_pieces(resid, n)
        local_csums = [jnp.cumsum(p) for p in pieces]
        offsets = [_exclusive_shard_offset(c[-1], ax) for c in local_csums]
        csums = [c + o for c, o in zip(local_csums, offsets)]
        grid_below = _grid_from_pieces(csums, cb, v0q)
        # the j-1 of the shard's first element lives on the previous shard —
        # reconstruct it from the exact integer shard offsets instead of
        # communicating: it is the grid count at the shard's starting cumsum.
        start = [jnp.reshape(o, (1,)) for o in offsets]
        grid_start = _grid_from_pieces(start, cb, v0q)
        prev = jnp.concatenate([grid_start, grid_below[:-1]])
        counts = det.astype(jnp.int32) + grid_below - prev

        # repair the quantization remainder so the GLOBAL total is exactly n,
        # on the global argmax-weight particle (first occurrence) — the
        # single-chip kernel's policy (kernels.residual_systematic_counts).
        total = jax.lax.psum(jnp.sum(counts), ax)
        local_max = jnp.max(w_l)
        owner = jnp.argmax(jax.lax.all_gather(local_max, ax))
        fix_here = (idx == owner).astype(jnp.int32)
        counts = counts.at[jnp.argmax(w_l)].add((n - total) * fix_here)
        return jnp.maximum(counts, 0)

    return counts_local


def resample_counts_sharded(key: jax.Array, weights: jnp.ndarray,
                            mesh: Mesh) -> jnp.ndarray:
    """Offspring counts of shard-distributed weights (counts stay sharded).
    Exposed separately so huge-N tests can validate counts without moving
    particle payloads."""
    ax = PARTICLE_AXIS
    body = resample_counts_sharded_fn(weights.shape[0], ax)
    return jax.shard_map(body, mesh=mesh, in_specs=(P(), P(ax)),
                         out_specs=P(ax), check_vma=False)(key, weights)


def resample_sharded(key: jax.Array, weights: jnp.ndarray,
                     particles: jnp.ndarray, log_lik: jnp.ndarray,
                     mesh: Mesh):
    """Residual-systematic resampling of shard-distributed particles.

    weights/log_lik: (N,) and particles: (N, d), sharded over
    mesh[PARTICLE_AXIS]. Returns (particles', log_lik') with the same
    shardings.
    """
    ax = PARTICLE_AXIS
    n = weights.shape[0]
    counts_local = resample_counts_sharded_fn(n, ax)

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P(ax), P(ax, None), P(ax)),
        out_specs=(P(ax, None), P(ax)),
        check_vma=False)
    def _inner(key, w_l, parts_l, lk_l):
        n_l = w_l.shape[0]
        counts = counts_local(key, w_l)

        # global slot offsets for this shard's particles (int32 — exact)
        local_counts_csum = jnp.cumsum(counts)
        offset = _exclusive_shard_offset(local_counts_csum[-1], ax)
        starts = local_counts_csum - counts + offset         # (n_l,)

        # Ancestors for the output slots: each count>0 particle marks its
        # start slot; cumsum of marks ranks the run covering every slot
        # (zero-count particles share a start with their successor and are
        # correctly skipped); nonzero-ids map ranks back to particle ids.
        all_starts = jax.lax.all_gather(starts, ax).reshape(-1)
        all_counts = jax.lax.all_gather(counts, ax).reshape(-1)
        marks = jnp.zeros(n, jnp.int32).at[all_starts].add(
            (all_counts > 0).astype(jnp.int32), mode="drop")
        anc_rank = jnp.cumsum(marks) - 1                    # rank among >0
        nz_ids = jnp.nonzero(all_counts > 0, size=n, fill_value=0)[0]
        ancestors = nz_ids[anc_rank]                        # (n,) global

        my_slots = jax.lax.axis_index(ax) * n_l + jnp.arange(n_l)
        my_anc = ancestors[my_slots]

        all_parts = jax.lax.all_gather(parts_l, ax).reshape(n, -1)
        all_lk = jax.lax.all_gather(lk_l, ax).reshape(n)
        return all_parts[my_anc], all_lk[my_anc]

    return _inner(key, weights, particles, log_lik)
