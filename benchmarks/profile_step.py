"""Component-level profile of the fused SMC step at 1e5 vs 1e6 particles.

Each component is timed as a K-iteration lax.fori_loop inside ONE jitted
program (axon tunnel dispatch latency varies 0.02-10 ms between sessions;
amortizing inside the program removes it — CLAUDE.md benchmarking rule).
Identifies the fixed per-step cost behind the 1e5-vs-1e6 per-particle gap
(VERDICT round-1 weak #3).
"""
import time

import jax
import jax.numpy as jnp
from jax import lax

from smc_tpu import SMCConfig
from smc_tpu.models.michaelis_menten import MichaelisMentenModel
from smc_tpu.smc.kernels import (find_gamma, residual_systematic_resample,
                                 _weighted_cov)


def timeit(fn, *args, iters=3):
    fn(*args)[0].block_until_ready() if isinstance(fn(*args), tuple) else \
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def loop_time(body, init, K=50, iters=3):
    """Seconds per body() application, amortized inside one jitted loop."""
    @jax.jit
    def run(x):
        return lax.fori_loop(0, K, lambda i, s: body(s), x)
    run(init)  # compile
    jax.block_until_ready(run(init))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = run(init)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / (K * iters)


def main():
    model = MichaelisMentenModel.default(method="exact")
    key = jax.random.key(0)

    for n in (100_000, 1_000_000):
        cfg = SMCConfig(n_particles=n)
        theta = model.prior.sample(key, n)
        ll, _ = jax.jit(lambda t: model.log_likelihood(t))(theta)
        w = jax.nn.softmax(ll * 1e-3)

        t_ll = loop_time(
            lambda th: th + 1e-6 * model.log_likelihood(th)[0][:, None],
            theta, K=20)
        t_gamma = loop_time(
            lambda l: l + 1e-6 * find_gamma(l, jnp.float32(0.3), cfg
                                            ).weights,
            ll, K=20)
        t_resample = loop_time(
            lambda wth: (wth[0] * (1 - 1e-7),
                         jnp.take(wth[1], residual_systematic_resample(
                             key, wth[0]), axis=0)),
            (w, theta), K=20)

        def cov_body(th):
            cov = _weighted_cov(th, cfg.cov_weight(3))
            chol = jnp.linalg.cholesky(cov)
            z = jax.random.normal(key, th.shape)
            return th + 1e-9 * (z @ chol.T)

        t_cov = loop_time(cov_body, theta, K=20)

        print(f"N={n:>9,}: loglik={t_ll*1e3:7.3f} ms  "
              f"gamma={t_gamma*1e3:7.3f} ms  "
              f"resample={t_resample*1e3:7.3f} ms  "
              f"cov+chol+mvn={t_cov*1e3:7.3f} ms")


if __name__ == "__main__":
    main()
