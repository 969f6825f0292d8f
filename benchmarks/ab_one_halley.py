"""Same-process A/B: round-1 initializer + 2 Halley steps vs round-2
[3/3] W/u initializer + 1 Halley step in the fused MM likelihood kernel,
fori-amortized on one chip.

Both are fp32-exact for W over logz in [-60, 60] (max rel err ~2.5e-7 =
2 ULP roundoff, fp64-sim method error 1.5e-12 vs 2.1e-10); the round-2
variant halves the per-point transcendental count and shortens the
serial dependency chain by one Halley iteration (~8 vector ops).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

import smc_tpu.ops.mm_pallas as mp
from smc_tpu.models.michaelis_menten import MichaelisMentenModel
from smc_tpu.utils.compile_cache import enable_persistent_cache

# Round-1 big-branch coefficients ([3/3] rational of ln(x) on [1, 60]
# feeding the asymptotic w0 = x - ln x + ln x / x), kept here as the A side.
_RAT_LN = (-1.90924131, 1.42049899, 0.487393935, 0.00826609657,
           1.33212944, 0.144640587, 0.00131222542)


def lambertw_round1(z, logz, iters: int = 2):
    a1, a2, a3, b1, b2, b3 = mp._PADE_W
    w_small = z * (1.0 + z * (a1 + z * (a2 + z * a3))) \
        / (1.0 + z * (b1 + z * (b2 + z * b3)))
    c0, c1, c2, c3, d1, d2, d3 = _RAT_LN
    x = jnp.clip(logz, 1.0, 60.0)
    lnx = (c0 + x * (c1 + x * (c2 + x * c3))) \
        / (1.0 + x * (d1 + x * (d2 + x * d3)))
    w_big = logz - lnx + lnx / jnp.maximum(logz, 1.0)
    w = jnp.where(z > jnp.e, w_big, w_small)
    for _ in range(2):          # round-1 needed two correctors
        ew = jnp.exp(w)
        f = w * ew - z
        denom = ew * (w + 1.0) - (w + 2.0) * f / (2.0 * w + 2.0)
        w = w - f / jnp.where(jnp.abs(denom) < 1e-30, 1e-30, denom)
    return w


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


if __name__ == "__main__":
    enable_persistent_cache()
    model = MichaelisMentenModel.default(method="pallas_exact")
    n = 100_000
    theta = model.prior.sample(jax.random.key(0), n)
    obs, s0 = model.obs, model.s0
    dt = float(np.asarray(model.ts)[1] - np.asarray(model.ts)[0])

    new_fn = mp._lambertw_fast
    for tag in ("1halley", "2halley", "1halley", "2halley"):
        mp._lambertw_fast = new_fn if tag == "1halley" else lambertw_round1
        print(f"{tag}: {timed(theta, obs, s0, dt):.3f} ms/sweep", flush=True)

    raw = mp.mm_loglik_exact_pallas.__wrapped__
    stat = ("dt", "block", "iters", "interpret")
    mp._lambertw_fast = new_fn
    a = jax.jit(raw, static_argnames=stat)(theta, obs, s0, dt)
    mp._lambertw_fast = lambertw_round1
    b = jax.jit(raw, static_argnames=stat)(theta, obs, s0, dt)
    mp._lambertw_fast = new_fn
    # -inf agrees with -inf (both reject the particle); compare the rest.
    fin = jnp.isfinite(a) & jnp.isfinite(b)
    assert bool(jnp.all(fin == (jnp.isfinite(a) | jnp.isfinite(b))))
    d = jnp.where(fin, jnp.abs(a - b) / jnp.maximum(jnp.abs(b), 1.0), 0.0)
    print("max rel ll diff 1halley vs 2halley (finite):",
          float(jnp.max(d)), "| n_inf:", int(jnp.sum(~fin)))
