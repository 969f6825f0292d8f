"""Streaming merge kernel: ancestor indices from sorted resampling slots.

Everything downstream of the resampling counts needs the ancestor ladder

    a[j] = max{ i : offsets_i <= j },   j = 0..N-1

where ``offsets`` is the exclusive prefix sum of the offspring counts
(all copies of particle i occupy output slots [offsets_i, offsets_{i+1})
— the reference's in-order copy loop, Micmem_SMC_main.py:178-184). The
XLA construction is a one-hot scatter + prefix sum
(smc/kernels.counts_to_ancestors), but EVERY TPU scatter lowers to a
serial per-index loop on the scalar core (~9 cycles/index: 897 us at
N=1e5 regardless of payload width — benchmarks/micro_permute.py), which
left the scatter as the dominant non-likelihood cost of the SMC step
(docs/PERF.md).

This kernel removes the scatter: a streaming two-pointer merge of the
sorted offsets against the output slot iota, where each (output tile,
offset chunk) visit is a dense vector compare

    a[j] += #{ k in chunk : offsets_k <= j }

— broadcast compares + a lane reduction, i.e. VPU work instead of
scalar-core pointer chasing. Offset chunks stream through a
double-buffered VMEM window by manual async DMA (kept lane-major,
(1, W), so every DMA slice is 128-aligned); an SMEM cursor carries the
merge pointer across the (sequential) output-tile grid, so each chunk is
touched ~once plus one boundary re-visit per tile.

Within a tile the slot index is laid out j = t*T + r*8 + s (r = sublane,
s = static sub-column): each of the 8 unrolled compares covers one
residue class of j, and the (tiles, 128, 8) output reshapes to the
linear ladder with no transpose.

Correctness notes (pinned bitwise vs the scatter construction in
tests/test_resample_pallas.py):
- zero-count particles repeat their successor's offset; the max{} picks
  the largest index at a tied offset, which is exactly the surviving
  owner (cumsum(one-hot-sum) counts ties identically);
- the merge pointer advances to the last chunk whose FIRST offset is
  <= tile_end: that chunk contains max{i : offsets_i <= tile_end} (all
  later chunks start above it), i.e. the owner of the next tile's first
  slot can never be skipped;
- a chunk is processed iff its predecessor's LAST offset is <= tile_end;
  sortedness makes every unprocessed chunk's offsets all > tile_end, and
  re-processed chunks contribute zero to later tiles only for offsets
  <= j, which the count formula wants anyway.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128
_SUBS = 8     # static sub-columns per tile (the j residue classes)
_T = _LANE * _SUBS   # 1024 output slots per grid step
_W = 1024     # offsets per streamed chunk (lane-major, 128-aligned);
              # tile/w swept in benchmarks/tune_merge.py: 1024/1024 wins
              # at both 1e5 (156 us) and 1e6 (1.65 ms) over 512-4096 combos
# Below this size the fixed pallas_call cost beats the scatter's per-index
# cost; the XLA construction is kept for tiny N (and non-TPU backends).
MIN_N = 4096


def _merge_kernel(last_ref, first_ref, offs_hbm, out_ref,
                  offs_buf, c_ref, sem, *, n_chunks, tile, w):
    t = pl.program_id(0)
    tile_end = (t + 1) * tile - 1

    @pl.when(t == 0)
    def _():
        c_ref[0] = 0

    c0 = c_ref[0]
    pltpu.make_async_copy(offs_hbm.at[c0], offs_buf.at[c0 % 2],
                          sem.at[c0 % 2]).start()

    subs = tile // _LANE
    # j for sub-column s: t*tile + subs*r + s over sublanes r.
    r8 = subs * jax.lax.broadcasted_iota(jnp.int32, (_LANE, 1), 0) + t * tile

    def cond(state):
        return state[1]

    def body(state):
        c, _, best, acc = state
        # Prefetch the next chunk iff this one's LAST offset says the merge
        # continues past it (reads prefetched SMEM, no data dependency).
        need_next = (c + 1 < n_chunks) & (last_ref[c] <= tile_end)

        @pl.when(need_next)
        def _():
            nxt = (c + 1) % 2
            pltpu.make_async_copy(offs_hbm.at[c + 1], offs_buf.at[nxt],
                                  sem.at[nxt]).start()

        slot = c % 2
        pltpu.make_async_copy(offs_hbm.at[c], offs_buf.at[slot],
                              sem.at[slot]).wait()
        offs = offs_buf[slot]                       # (1, W) int32, sorted
        cols = []
        for s in range(subs):                       # static unroll
            e = (offs <= (r8 + s)).astype(jnp.int32)     # (LANE, W)
            cols.append(jnp.sum(e, axis=1, keepdims=True))
        acc = acc + jnp.concatenate(cols, axis=1)   # (LANE, subs)
        best = jnp.where(first_ref[c] <= tile_end, c, best)
        return (c + 1, need_next, best, acc)

    acc0 = jnp.zeros((_LANE, subs), jnp.int32)
    always = tile_end >= 0        # the start chunk is always processed
    _, _, best, acc = jax.lax.while_loop(cond, body, (c0, always, c0, acc0))
    # Offsets in chunks before c0 are all <= this tile's first slot
    # (they are <= the previous tile's end by the cursor invariant).
    out_ref[0] = acc + (c0 * w - 1)
    c_ref[0] = best


@functools.partial(jax.jit, static_argnames=("interpret", "tile", "w"))
def sorted_offsets_to_ancestors(offsets: jnp.ndarray,
                                interpret: bool = False,
                                tile: int = _T, w: int = _W) -> jnp.ndarray:
    """a[j] = max{i : offsets[i] <= j} for sorted int32 offsets in [0, n].

    Bitwise-identical to the scatter construction
    ``cumsum(zeros.at[offsets].add(1)) - 1`` (which is used off-TPU and
    below MIN_N, where the kernel's fixed cost doesn't pay). tile/w (the
    output slots per grid step and offsets per streamed chunk) are the
    measured optimum; exposed for the tuning sweep in
    benchmarks/ab_merge_anc.py.
    """
    n = offsets.shape[0]
    if (n < MIN_N and not interpret) or (
            not interpret and jax.default_backend() != "tpu"):
        hist = jnp.zeros(n, jnp.int32).at[offsets].add(
            1, mode="drop", indices_are_sorted=True)
        return jnp.cumsum(hist) - 1

    assert tile % _LANE == 0 and w % _LANE == 0
    n_tiles = -(-n // tile)
    np_out = n_tiles * tile
    n_chunks = -(-n // w)
    np_in = n_chunks * w
    # Sentinel pad: np_out exceeds every output slot index, so padded
    # entries are never counted. (Real offsets may equal n < np_out; they
    # only affect the sliced-away padded slots.)
    offs_p = jnp.pad(offsets.astype(jnp.int32), (0, np_in - n),
                     constant_values=np_out)
    chunk_last = offs_p[w - 1::w]
    chunk_first = offs_p[0::w]
    offs_r = offs_p.reshape(n_chunks, 1, w)

    out = pl.pallas_call(
        functools.partial(_merge_kernel, n_chunks=n_chunks, tile=tile, w=w),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_tiles,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((1, _LANE, tile // _LANE),
                                   lambda i, *_: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, 1, w), jnp.int32),    # offset chunk window
                pltpu.SMEM((1,), jnp.int32),         # merge cursor
                pltpu.SemaphoreType.DMA((2,)),
            ]),
        out_shape=jax.ShapeDtypeStruct((n_tiles, _LANE, tile // _LANE),
                                       jnp.int32),
        # The SMEM cursor carries across grid steps: forbid parallelization.
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(chunk_last, chunk_first, offs_r)
    return out.reshape(np_out)[:n]
