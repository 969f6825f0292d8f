"""Microbench: TPU costs of the permutation-primitive zoo at N=1e5.

Times the candidate building blocks for the resampling-copy problem
(out[s] = v[anc[s]], anc from sorted offsets) to pick a design by data:
scatter variants, gather, multi-payload sort, associative-scan ffill.
fori-amortized; absolute numbers inflated by isolation but comparable.
"""
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from smc_tpu.utils.compile_cache import enable_persistent_cache


def timed(make_fn, reps=300):
    fn = jax.jit(make_fn)
    fn().block_until_ready()
    t0 = time.perf_counter()
    fn().block_until_ready()
    return (time.perf_counter() - t0) / reps * 1e3


def main(n=100_000, k=4, reps=300):
    rng = np.random.default_rng(0)
    w = rng.dirichlet(np.ones(n)).astype(np.float32)
    counts = np.floor(w * n).astype(np.int32)
    counts[np.argmax(counts)] += n - counts.sum()
    offsets = jnp.asarray(np.cumsum(counts) - counts, jnp.int32)
    dv = jnp.asarray(rng.integers(-2**30, 2**30, (k, n)), jnp.int32)
    anc = jnp.asarray(np.repeat(np.arange(n), counts), jnp.int32)
    uniq = jnp.asarray(np.arange(n), jnp.int32)
    key = jnp.asarray(rng.integers(0, n, n), jnp.int32)
    keyf = jnp.asarray(rng.random(n), jnp.float32)

    def loop(body):
        def f():
            def b(i, c):
                return c + body(i)[:1, :1]
            return jax.lax.fori_loop(0, reps, b, jnp.zeros((1, 1), jnp.int32))
        return f

    z = jnp.zeros((k, n), jnp.int32)
    cases = {
        "scatter-add dup sorted (current)": loop(
            lambda i: z.at[:, offsets].add(dv + i, mode="drop",
                                           indices_are_sorted=True)),
        "scatter-add dup unsorted": loop(
            lambda i: z.at[:, offsets].add(dv + i, mode="drop")),
        "scatter-add unique sorted": loop(
            lambda i: z.at[:, uniq].add(dv + i, mode="drop",
                                        indices_are_sorted=True,
                                        unique_indices=True)),
        "scatter-set unique sorted": loop(
            lambda i: z.at[:, uniq].set(dv + i, mode="drop",
                                        indices_are_sorted=True,
                                        unique_indices=True)),
        "gather sorted anc (k cols)": loop(
            lambda i: jnp.take(dv + i, anc, axis=1)),
        "gather sorted anc, indices_sorted": loop(
            lambda i: jax.lax.gather(
                (dv + i).T, anc[:, None],
                jax.lax.GatherDimensionNumbers(
                    offset_dims=(1,), collapsed_slice_dims=(0,),
                    start_index_map=(0,)),
                (1, k), indices_are_sorted=True).T),
        "sort s32 key + 4 payloads": loop(
            lambda i: jax.lax.sort((key + i,) + tuple(dv), num_keys=1)[1]),
        "sort s32 key only + iota": loop(
            lambda i: jax.lax.sort((key + i, uniq), num_keys=1)[1][None]),
        "cumsum (k, n) lanes": loop(
            lambda i: jnp.cumsum(dv + i, axis=1)),
        "assoc-scan ffill (valid, k vals)": loop(
            lambda i: jax.lax.associative_scan(
                _ffill_op,
                ((key + i > n // 2).astype(jnp.int32),) + tuple(dv))[1][None]),
    }
    for name, f in cases.items():
        try:
            ms = timed(f, reps)
            print(f"{name:<40} {ms * 1e3:8.1f} us", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name:<40} FAILED: {type(e).__name__}: {e}",
                  flush=True)


def _ffill_op(a, b):
    av, bv = a[0], b[0]
    return (av | bv,) + tuple(jnp.where(bv > 0, y, x)
                              for x, y in zip(a[1:], b[1:]))




def main2(n=100_000, k=4, reps=300):
    """Addendum: K-dependence of scatter cost + full composite candidates.

    Every loop body re-derives its operands through an optimization_barrier
    on loop-varying data, so XLA cannot hoist the scatter/gather out of the
    fori_loop (the first version of this bench used `+ i * 0` operands and
    measured the hoisted-empty loop: 77 us for a 900 us scatter).
    """
    rng = np.random.default_rng(0)
    w = rng.dirichlet(np.ones(n)).astype(np.float32)
    counts = np.floor(w * n).astype(np.int32)
    counts[np.argmax(counts)] += n - counts.sum()
    offsets = jnp.asarray(np.cumsum(counts) - counts, jnp.int32)
    dv = jnp.asarray(rng.integers(-2**30, 2**30, (k, n)), jnp.int32)

    def timed2(body):
        def f():
            def b(i, c):
                off, val = jax.lax.optimization_barrier(
                    (offsets + i - i, dv + i - i))
                return c + body(off, val)[:1, :1]
            return jax.lax.fori_loop(0, reps, b,
                                     jnp.zeros((1, 1), jnp.int32))
        fn = jax.jit(f)
        fn().block_until_ready()
        t0 = time.perf_counter()
        fn().block_until_ready()
        return (time.perf_counter() - t0) / reps * 1e3

    z1 = jnp.zeros((n,), jnp.int32)
    zk = jnp.zeros((k, n), jnp.int32)

    def hist_anc(off, val):
        h = z1.at[off].add(1, mode="drop", indices_are_sorted=True)
        return (jnp.cumsum(h) - 1)[None]

    def composite_anc_gather(off, val):
        anc = hist_anc(off, val)[0]
        return jnp.take(val, anc, axis=1)

    def current_scatter_fill(off, val):
        d = jnp.concatenate([val[:, :1], val[:, 1:] - val[:, :-1]],
                            axis=1)
        filled = zk.at[:, off].add(d, mode="drop",
                                   indices_are_sorted=True)
        return jnp.cumsum(filled, axis=1)

    cases = {
        "scatter-add K=1 hist sorted": lambda off, val: z1.at[off].add(
            1, mode="drop", indices_are_sorted=True)[None],
        "anc = hist + cumsum": hist_anc,
        "COMPOSITE anc+gather(K=4)": composite_anc_gather,
        "COMPOSITE current scatter+cumsum": current_scatter_fill,
    }
    for name, body in cases.items():
        print(f"{name:<40} {timed2(body) * 1e3:8.1f} us", flush=True)


if __name__ == "__main__":
    enable_persistent_cache()
    main()
    main2()
