"""Tune the merge-kernel tile/chunk sizes and split the apply cost.

fori-amortized on one chip; weights re-drawn per rep (fold_in) so nothing
hoists out of the loop.
"""
import time

import jax
import jax.numpy as jnp

from smc_tpu.smc import kernels
from smc_tpu.ops.resample_pallas import sorted_offsets_to_ancestors
from smc_tpu.utils.compile_cache import enable_persistent_cache


def timeit(fn, reps=50):
    @jax.jit
    def run(key):
        def body(i, c):
            return c ^ fn(jax.random.fold_in(key, i))[:1]
        return jax.lax.fori_loop(0, reps, body, jnp.zeros((1,), jnp.int32))
    out = run(jax.random.PRNGKey(0))
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = run(jax.random.PRNGKey(9))
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e6


def main():
    enable_persistent_cache()
    for n in (100_000, 1_000_000):
        w0 = jax.random.dirichlet(jax.random.PRNGKey(1), jnp.full(n, 0.1))
        parts = jax.random.normal(jax.random.PRNGKey(2), (n, 3))
        ll = jax.random.normal(jax.random.PRNGKey(3), (n,))

        def offsets_only(key):
            _, o = kernels._rs_counts_offsets(key, w0)
            return o

        def anc(key, **kw):
            _, o = kernels._rs_counts_offsets(key, w0)
            return sorted_offsets_to_ancestors(o, **kw)

        def full(key):
            p, _ = kernels.residual_systematic_apply(key, w0, (parts, ll))
            return p[:, 0].astype(jnp.int32)

        print(f"-- N={n:.0e}", flush=True)
        print(f"  counts+offsets only : {timeit(offsets_only):7.0f} us")
        print(f"  + merge (default)   : {timeit(anc):7.0f} us")
        print(f"  full apply (+gather): {timeit(full):7.0f} us", flush=True)
        for tile in (1024, 2048, 4096):
            for w in (256, 512, 1024, 2048):
                us = timeit(lambda k, t=tile, ww=w: anc(k, tile=t, w=ww))
                print(f"  tile={tile:5d} w={w:5d}: {us:7.0f} us", flush=True)


if __name__ == "__main__":
    main()
