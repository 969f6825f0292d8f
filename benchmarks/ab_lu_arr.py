"""A/B: array-form vs unrolled-loop block LU/solves in the Thomas sweeps.

Run on the real chip:  python benchmarks/ab_lu_arr.py

PERF.md pins the DAE march as bound by loop-iteration overhead and
small-op scheduling (~3% VPU utilization), not FLOPs or HBM. The unrolled
loop forms issue ~300 lane-width (B,) ops per block step; the array forms
(lu7_*_arr) issue ~3 wide (7, 7, B) ops per elimination step — ~20x fewer
op issues for 12.5% sublane padding (7 -> 8). Interleaved same-process
A/B at the flagship shape (128 particles x 30 conditions x nx=51, 48-step
march), plus isolated factor/solve microbenches.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from smc_tpu.ops import dae_fast as df


def march_fn(flag):
    from smc_tpu.models.methanation import MethanationModel
    df._LU_ARR = flag
    model = MethanationModel.default(n_conditions=30, particle_chunk=128)
    fn = jax.jit(lambda th: model.log_likelihood(th)[0])
    theta = jnp.tile(jnp.asarray([[13.04, 52.2e3, 1.147e5, 96.7e3, 5.0]],
                                 jnp.float32), (128, 1))
    fn(theta).block_until_ready()  # compile
    df._LU_ARR = False
    return fn, theta


def time_reps(fn, theta, secs=6.0):
    t0 = time.perf_counter()
    reps = 0
    while time.perf_counter() - t0 < secs:
        fn(theta).block_until_ready()
        reps += 1
    return (time.perf_counter() - t0) / reps


def micro(flag, B=3840, reps=200):
    df._LU_ARR = flag
    rng = np.random.default_rng(0)
    A = rng.normal(size=(7, 7, B)).astype(np.float32)
    A[np.arange(7), np.arange(7)] += 8.0
    A = jnp.asarray(A)
    r = jnp.asarray(rng.normal(size=(7, 2, B)).astype(np.float32))

    @jax.jit
    def body(A, r):
        def one(c, _):
            lu = df._lu_f(A + c * 1e-6)
            x = df._lu_s(lu, r)
            return c + 1, jnp.sum(x[:, 0, :], 0)
        _, out = jax.lax.scan(one, 0.0, None, length=reps)
        return out

    body(A, r).block_until_ready()
    t0 = time.perf_counter()
    body(A, r).block_until_ready()
    dt = (time.perf_counter() - t0) / reps
    df._LU_ARR = False
    return dt * 1e6


def main():
    print(f"micro factor+solve (B=3840): loop {micro(False):8.1f} us   "
          f"arr {micro(True):8.1f} us", flush=True)

    fn_loop, theta = march_fn(False)
    fn_arr, _ = march_fn(True)
    # interleaved
    for rnd in range(2):
        dt_l = time_reps(fn_loop, theta)
        dt_a = time_reps(fn_arr, theta)
        print(f"round {rnd}: loop {128 / dt_l:7.1f} pps   "
              f"arr {128 / dt_a:7.1f} pps", flush=True)


if __name__ == "__main__":
    main()
