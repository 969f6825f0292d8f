"""Gradient-based MAP / point estimation on any differentiable model.

A beyond-reference capability unlocked by the on-device simulators being
JAX-differentiable (the reference's SciPy/SUNDIALS workers are black boxes
— its only estimator is the full SMC posterior): multi-start Adam on the
unnormalized log-posterior, all starts optimized IN PARALLEL on the
particle lane axis (a (K, d) batch through the same vectorized
log_likelihood the SMC sweeps use — K starts cost one sweep per step).

Works with every model whose ``log_likelihood`` is differentiable: the
closed-form/ODE models, ``ODEModel`` (rk4/dopri5/bdf2/DAE), and the
flagship ``MethanationModel(march="steady")`` via its implicit-function-
theorem adjoint (models/methanation._make_steady_solve).

Optimization runs in a per-dimension standardized space (uniform dims
scaled by width/sqrt(12), normal dims by their std) so one learning rate
serves parameters spanning decades (e.g. methanation's Af ~ 13 vs
Ear ~ 1e5); iterates are *projected* back into the uniform support after
every Adam update (clipping only inside the objective would zero the
gradient beyond the boundary and strand overshooting starts there), and
starts whose likelihood fails (-inf / NaN, e.g. diverged DAE lanes)
contribute zero gradient — they stall instead of poisoning the batch.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from smc_tpu.priors import UNIFORM


class MAPResult(NamedTuple):
    theta: jnp.ndarray        # (d,) best start's final iterate
    log_post: jnp.ndarray     # () its unnormalized log-posterior
    all_theta: jnp.ndarray    # (K, d) every start's final iterate
    all_log_post: jnp.ndarray  # (K,)


def map_estimate(model, key: jax.Array, n_starts: int = 8,
                 steps: int = 800, lr: float = 0.1) -> MAPResult:
    """Multi-start MAP: argmax_theta log P(y|theta) + log P(theta).

    n_starts prior draws are optimized in parallel with cosine-decayed
    Adam for ``steps`` iterations in the standardized space; returns the
    best (and all) final iterates. One jitted program; reuse across keys
    is cheap. Noise-scale parameters make the landscape flat far from the
    fit (optimal sigma inflates, 1/sigma^2 gradients vanish), so the decay
    schedule matters: high lr early to cross the flat region, low late to
    settle the sharp optimum.
    """
    import optax

    prior = model.prior
    width = prior.high - prior.low
    scale = jnp.where(prior.kind == UNIFORM, width / jnp.sqrt(12.0),
                      prior.scale)
    center = jnp.where(prior.kind == UNIFORM,
                       0.5 * (prior.low + prior.high), prior.loc)
    # keep uniform dims strictly inside the open support (log_pdf is -inf
    # at the clip target otherwise; 1e-4 relative inset is below any
    # plausible posterior scale)
    lo = jnp.where(prior.kind == UNIFORM, prior.low + 1e-4 * width, -jnp.inf)
    hi = jnp.where(prior.kind == UNIFORM, prior.high - 1e-4 * width, jnp.inf)

    z_lo, z_hi = (lo - center) / scale, (hi - center) / scale

    def theta_of(z):
        return center + jnp.clip(z, z_lo, z_hi) * scale

    def objective(z):
        th = theta_of(z)
        ll, _ = model.log_likelihood(th)
        lp = prior.log_pdf(th)
        v = ll + lp
        return -jnp.sum(jnp.where(jnp.isfinite(v), v, 0.0)), v

    def sweep(opt, z0, v0, z_best0, v_best0, n):
        """n Adam steps from z0, tracking each start's best iterate seen
        (Adam at high lr can bounce out of a basin it already visited)."""

        def step(carry, _):
            z, opt_state, z_best, v_best = carry
            (_, v), g = jax.value_and_grad(objective, has_aux=True)(z)
            g = jnp.where(jnp.isfinite(g), g, 0.0)
            v = jnp.where(jnp.isfinite(v), v, -jnp.inf)
            better = v > v_best
            z_best = jnp.where(better[:, None], z, z_best)
            v_best = jnp.maximum(v, v_best)
            updates, opt_state = opt.update(g, opt_state, z)
            z = jnp.clip(optax.apply_updates(z, updates), z_lo, z_hi)
            return (z, opt_state, z_best, v_best), None

        (z, _, z_best, v_best), _ = jax.lax.scan(
            step, (z0, opt.init(z0), z_best0, v_best0), None, length=n)
        _, v = objective(z)
        v = jnp.where(jnp.isfinite(v), v, -jnp.inf)
        better = v > v_best
        z_best = jnp.where(better[:, None], z, z_best)
        v_best = jnp.maximum(v, v_best)
        return z_best, v_best

    def run(key):
        z0 = (prior.sample(key, n_starts) - center) / scale
        v0 = jnp.full((n_starts,), -jnp.inf)
        # explore: cosine-decayed Adam from the prior draws
        explore = optax.adam(optax.cosine_decay_schedule(lr, steps,
                                                         alpha=0.01))
        z_best, v_best = sweep(explore, z0, v0, z0, v0, steps)
        # polish: restart at each start's best point with a small lr
        polish = optax.adam(lr * 0.02)
        z_best, v_best = sweep(polish, z_best, v_best, z_best, v_best,
                               max(steps // 4, 1))
        best = jnp.argmax(v_best)
        th = theta_of(z_best)
        return MAPResult(th[best], v_best[best], th, v_best)

    return jax.jit(run)(key)
