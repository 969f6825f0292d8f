"""Same-process A/B: 2-exp Halley vs 1-exp (Taylor-updated) Halley in the
fused MM likelihood kernel, fori-amortized on one chip."""
import time

import jax
import jax.numpy as jnp
import numpy as np

import smc_tpu.ops.mm_pallas as mp
from smc_tpu.models.michaelis_menten import MichaelisMentenModel
from smc_tpu.utils.compile_cache import enable_persistent_cache


def timed(theta, obs, s0, dt, reps=200):
    # fresh jit per call: the module-level jitted wrapper would cache-hit
    # across the _lambertw_fast swap and time the wrong variant.
    raw = mp.mm_loglik_exact_pallas.__wrapped__

    @jax.jit
    def loop(t):
        def body(_, c):
            return c + 1e-12 * raw(t + c[:1, None] * 0, obs, s0, dt)[:1]
        return jax.lax.fori_loop(0, reps, body, jnp.zeros(1))
    loop(theta).block_until_ready()
    t0 = time.perf_counter()
    loop(theta).block_until_ready()
    return (time.perf_counter() - t0) / reps * 1e3


def lambertw_2exp(z, logz, iters: int = 2):
    a1, a2, a3, b1, b2, b3 = mp._PADE_W
    w_small = z * (1.0 + z * (a1 + z * (a2 + z * a3))) \
        / (1.0 + z * (b1 + z * (b2 + z * b3)))
    c0, c1, c2, c3, d1, d2, d3 = mp._RAT_LN
    x = jnp.clip(logz, 1.0, 60.0)
    lnx = (c0 + x * (c1 + x * (c2 + x * c3))) \
        / (1.0 + x * (d1 + x * (d2 + x * d3)))
    w_big = logz - lnx + lnx / jnp.maximum(logz, 1.0)
    w = jnp.where(z > jnp.e, w_big, w_small)
    for _ in range(iters):
        ew = jnp.exp(w)
        f = w * ew - z
        denom = ew * (w + 1.0) - (w + 2.0) * f / (2.0 * w + 2.0)
        w = w - f / jnp.where(jnp.abs(denom) < 1e-30, 1e-30, denom)
    return w


if __name__ == "__main__":
    enable_persistent_cache()
    model = MichaelisMentenModel.default(method="pallas_exact")
    n = 100_000
    key = jax.random.key(0)
    theta = model.prior.sample(key, n)
    import numpy as np
    obs, s0 = model.obs, model.s0
    dt = float(np.asarray(model.ts)[1] - np.asarray(model.ts)[0])

    new_fn = mp._lambertw_fast
    results = {}
    for tag in ("1exp", "2exp", "1exp", "2exp"):
        mp._lambertw_fast = new_fn if tag == "1exp" else lambertw_2exp
        ms = timed(theta, obs, s0, dt)
        print(f"{tag}: {ms:.3f} ms/sweep", flush=True)
        results.setdefault(tag, []).append(ms)
    # numeric agreement (fresh jits — the module wrapper would cache-hit
    # across the swap)
    raw = mp.mm_loglik_exact_pallas.__wrapped__
    stat = ("dt", "block", "iters", "interpret")
    mp._lambertw_fast = new_fn
    a = jax.jit(raw, static_argnames=stat)(theta, obs, s0, dt)
    mp._lambertw_fast = lambertw_2exp
    b = jax.jit(raw, static_argnames=stat)(theta, obs, s0, dt)
    mp._lambertw_fast = new_fn
    print("max |1exp-2exp| ll diff:", float(jnp.max(jnp.abs(a - b))))
