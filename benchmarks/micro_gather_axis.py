"""Sorted-ancestor gather orientations: lane-axis (K, N) vs sublane-axis
(N, K) vs per-leaf takes. Decides the payload-move form after the merge
kernel (docs/PERF.md). The loop counter perturbs the payload (not the
indices) so the gather itself cannot hoist; optimization_barrier keeps the
add from folding."""
import time

import jax
import jax.numpy as jnp

from smc_tpu.utils.compile_cache import enable_persistent_cache


def timeit(fn, reps=50):
    @jax.jit
    def run(x0):
        def body(i, c):
            return c + fn(i)[:1]
        return jax.lax.fori_loop(0, reps, body, x0)
    z = jnp.zeros((1,), jnp.float32)
    jax.block_until_ready(run(z))
    t0 = time.perf_counter()
    jax.block_until_ready(run(z + 1))
    return (time.perf_counter() - t0) / reps * 1e6


def main():
    enable_persistent_cache()
    for n in (100_000, 1_000_000):
        k = jax.random.PRNGKey(0)
        # sorted ancestors with realistic duplication (~half survive)
        a = jnp.sort(jax.random.randint(k, (n,), 0, n // 2) * 2)
        bk = jax.random.normal(jax.random.PRNGKey(1), (4, n))
        bn = bk.T.copy()

        def lane(i):
            src = jax.lax.optimization_barrier(bk + i)
            return jnp.take(src, a, axis=1, indices_are_sorted=True)[0, :1]

        def sub(i):
            src = jax.lax.optimization_barrier(bn + i)
            return jnp.take(src, a, axis=0, indices_are_sorted=True)[:1, 0]

        def leaves(i):
            src = jax.lax.optimization_barrier(bk + i)
            outs = [jnp.take(src[j], a, indices_are_sorted=True)
                    for j in range(4)]
            return outs[0][:1] + outs[1][:1] + outs[2][:1] + outs[3][:1]

        print(f"-- N={n:.0e}")
        print(f"  lane-axis (4, N)   : {timeit(lane):7.0f} us")
        print(f"  sublane-axis (N, 4): {timeit(sub):7.0f} us")
        print(f"  4 separate 1-D     : {timeit(leaves):7.0f} us", flush=True)


if __name__ == "__main__":
    main()
