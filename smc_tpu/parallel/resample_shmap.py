"""Explicit cross-shard residual-systematic resampling (shard_map).

The default path lets XLA's SPMD partitioner distribute the global-view
kernel (smc_tpu.smc.kernels); this module is the hand-scheduled equivalent
with every collective explicit, for meshes where the partitioner's choices
need overriding and as executable documentation of the distributed
algorithm:

- one shared uniform draw v0 (same key on every shard);
- per-shard local inclusive cumsum of residual weights, lifted to the
  global prefix sum by an exclusive-over-shards offset (psum of masked
  shard totals — ICI);
- counts from the same two-floor grid-counting identity as the single-chip
  kernel, entirely shard-local once offsets are known;
- slot offsets by the identical exclusive-prefix trick over count totals;
- the particle exchange as an all_gather of the (small) particle block +
  local gather — the explicit form of the cross-shard gather the XLA path
  emits.

Matches smc_tpu.smc.kernels.residual_systematic_resample + take exactly
(same draw, same arithmetic; tested in tests/test_sharding.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from smc_tpu.parallel.mesh import PARTICLE_AXIS


def _exclusive_shard_offset(local_total: jnp.ndarray, axis: str):
    """Exclusive prefix sum of a per-shard scalar over the mesh axis."""
    idx = jax.lax.axis_index(axis)
    n_shards = jax.lax.axis_size(axis)
    # all_gather the shard totals (tiny) and mask below our index.
    totals = jax.lax.all_gather(local_total, axis)          # (S,)
    mask = jnp.arange(n_shards) < idx
    return jnp.sum(jnp.where(mask, totals, 0.0))


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

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P(ax), P(ax, None), P(ax)),
        out_specs=(P(ax, None), P(ax)),
        check_vma=False)
    def _inner(key, w_l, parts_l, lk_l):
        n_l = w_l.shape[0]
        idx = jax.lax.axis_index(ax)

        v0 = jax.random.uniform(key, ())            # same draw on all shards

        scaled = w_l * n
        det = jnp.floor(scaled)
        resid = scaled - det
        local_csum = jnp.cumsum(resid)
        csum = local_csum + _exclusive_shard_offset(local_csum[-1], ax)
        grid_below = jnp.maximum(jnp.floor(csum - v0) + 1.0, 0.0)
        # extra_j = grid_below_j - grid_below_{j-1}; the j-1 of a shard's
        # first element lives on the previous shard — reconstruct it from
        # the global prefix instead of communicating: it is the count of
        # grid points below the shard's starting cumsum.
        start = csum[0] - resid[0]
        below_start = jnp.maximum(jnp.floor(start - v0) + 1.0, 0.0)
        prev = jnp.concatenate([below_start[None], grid_below[:-1]])
        counts = (det + grid_below - prev).astype(jnp.int32)

        # repair fp drift so the GLOBAL total is exactly n (on shard 0's
        # max-weight slot, mirroring the single-chip kernel's policy).
        total = jax.lax.psum(jnp.sum(counts), ax)
        fix_here = (idx == 0).astype(jnp.int32)
        counts = counts.at[jnp.argmax(w_l)].add((n - total) * fix_here)
        counts = jnp.maximum(counts, 0)

        # global slot offsets for this shard's particles
        local_counts_csum = jnp.cumsum(counts)
        offset = _exclusive_shard_offset(
            local_counts_csum[-1].astype(jnp.float32), ax)
        starts = (local_counts_csum - counts
                  + offset.astype(jnp.int32))              # (n_l,)

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
