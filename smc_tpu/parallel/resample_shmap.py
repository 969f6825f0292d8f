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
        # O(N)-per-chip traffic + memory: every shard receives the full
        # particle set. Kept as the simple reference form; the scalable
        # path is resample_sharded_ring below.
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


def resample_sharded_ring(key: jax.Array, weights: jnp.ndarray,
                          particles: jnp.ndarray, log_lik: jnp.ndarray,
                          mesh: Mesh):
    """Scale-out form of :func:`resample_sharded`: O(N/S) per-chip traffic
    and memory instead of O(N).

    Both the XLA-partitioned kernel and :func:`resample_sharded` move the
    FULL particle payload to every chip (all-gather) — measured 52
    B/particle/step of ICI traffic for the MM step
    (benchmarks/scaling_model.py), the one per-step collective that grows
    with N and the blocker for 10^8+-particle meshes (per-chip memory
    O(N)). This kernel exploits the structure of residual-systematic
    ancestors: slot starts are NONDECREASING in global particle id, so the
    ancestors of shard s's contiguous output slots form a contiguous id
    range — after resampling, particle order correlates with weight-mass
    quantiles, so that range is almost always s's own block plus a
    neighbor (the ancestor map stays near-diagonal across SMC steps).

    Algorithm (inside one shard_map body):
    - offspring counts exactly as the single-chip kernel (chunked-int32;
      bitwise-identical at any N), all collectives scalar-sized;
    - global slot starts per local particle by integer shard offsets;
    - fill my n/S output slots from my OWN block (searchsorted over the
      block's sorted starts — zero communication, resolves ~everything
      when the map is near-diagonal);
    - while any shard still has unfilled slots (psum — the same value on
      every shard, so the loop trip count is globally agreed): rotate two
      block-sized buffers (particles, log-liks, starts, counts) around the
      ring with lax.ppermute — one forward, one backward — and fill from
      both. Round r covers blocks s-r..s+r, so the loop terminates in at
      most ceil((S-1)/2) rounds and in practice 0-1.

    Per-round traffic: 2 block payloads per chip = 2N(d+2)*4/S bytes —
    at S=8, d=3 that is ~16x less than the all-gather forms (and it only
    gets better with S). Output is BITWISE-equal to
    jnp.take(particles, counts_to_ancestors(residual_systematic_counts())):
    same draw, same integer counts, same sorted-slot ancestor semantics
    (tests/test_sharding.py::test_ring_resampler_matches_single_chip).

    Replaces: the reference's host-global resampling copy loop
    (SMC_example/Micmem_SMC_main.py:146-184) — there, "communication" is
    free shared memory; on a TPU pod it is ICI, and this kernel is the
    ICI-native form.
    """
    ax = PARTICLE_AXIS
    n = weights.shape[0]
    counts_local = resample_counts_sharded_fn(n, ax)
    n_shards = mesh.shape[ax]
    fwd = [((i + 1) % n_shards, i) for i in range(n_shards)]  # recv s+r
    bwd = [((i - 1) % n_shards, i) for i in range(n_shards)]  # recv s-r

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P(ax), P(ax, None), P(ax)),
        out_specs=(P(ax, None), P(ax)),
        check_vma=False)
    def _inner(key, w_l, parts_l, lk_l):
        n_l = w_l.shape[0]
        idx = jax.lax.axis_index(ax)
        counts = counts_local(key, w_l)
        csum = jnp.cumsum(counts)
        starts = csum - counts + _exclusive_shard_offset(csum[-1], ax)

        slots = idx * n_l + jnp.arange(n_l, dtype=jnp.int32)

        def fill(state, buf):
            out_p, out_l, filled = state
            b_starts, b_counts, b_parts, b_lk = buf
            # owner of slot k in this block: last j with b_starts[j] <= k
            # (ties from zero-count particles always resolve to the owner:
            # every j past the owner has start > k).
            j = jnp.searchsorted(b_starts, slots, side="right") - 1
            jc = jnp.clip(j, 0, n_l - 1)
            ok = ((j >= 0) & (b_starts[jc] <= slots)
                  & (slots < b_starts[jc] + b_counts[jc]))
            take = ok & ~filled
            out_p = jnp.where(take[:, None], b_parts[jc], out_p)
            out_l = jnp.where(take, b_lk[jc], out_l)
            return out_p, out_l, filled | ok

        state = fill((jnp.zeros_like(parts_l), jnp.zeros_like(lk_l),
                      jnp.zeros((n_l,), bool)),
                     (starts, counts, parts_l, lk_l))
        missing = jax.lax.psum(jnp.sum(~state[2]), ax)
        buf0 = (starts, counts, parts_l, lk_l)

        def cond(c):
            return c[4] > 0

        def body(c):
            state, buf_f, buf_b, r, _ = c
            buf_f = jax.tree_util.tree_map(
                lambda x: jax.lax.ppermute(x, ax, fwd), buf_f)
            buf_b = jax.tree_util.tree_map(
                lambda x: jax.lax.ppermute(x, ax, bwd), buf_b)
            state = fill(fill(state, buf_f), buf_b)
            return (state, buf_f, buf_b, r + 1,
                    jax.lax.psum(jnp.sum(~state[2]), ax))

        (out_p, out_l, _), _, _, _, _ = jax.lax.while_loop(
            cond, body, (state, buf0, buf0, jnp.zeros((), jnp.int32),
                         missing))
        return out_p, out_l

    return _inner(key, weights, particles, log_lik)
