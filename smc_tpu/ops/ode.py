"""On-device explicit ODE integrators.

TPU-native replacement for the reference's host-side scipy ``solve_ivp``
RK45 calls (SMC_example/Micmem_likelihood.py:24-30,
SMC_example/Micmen_generate_data.py:18-24). Design:

- Fixed-grid steppers built on ``lax.scan`` over the observation grid with a
  static number of substeps per interval — static shapes, no data-dependent
  control flow, so the whole solve fuses into one XLA program that can be
  ``vmap``-ed over particles x datasets and sharded with pjit.
- ``dopri5_grid`` is a Dormand-Prince 5(4) pair on the same fixed substep
  grid; its embedded 4th-order error estimate is returned so callers can
  mask diverged trajectories to -inf log-likelihood (replacing the
  reference's -10000 sentinel, methanation_set_likelihood.py:244).

Adaptive step-size control is intentionally *not* data-dependent: per-particle
adaptivity would serialize the vmap lanes. Instead callers pick ``substeps``
for the worst-case stiffness of the batch (cheap for these kinetics ODEs).
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax


def _scan_grid(step1, f, y0, ts, substeps):
    """Scan `step1` over observation intervals with `substeps` substeps each.

    Returns ys with shape (len(ts), *y0.shape); ys[0] == y0.
    """
    def interval(carry, t_pair):
        y, err_acc = carry
        t0, t1 = t_pair
        h = (t1 - t0) / substeps

        def sub(i, val):
            y, err_acc = val
            t = t0 + i * h
            y, err = step1(f, t, y, h)
            return y, jnp.maximum(err_acc, err)

        y, err_acc = lax.fori_loop(0, substeps, sub, (y, err_acc))
        return (y, err_acc), y

    t_pairs = jnp.stack([ts[:-1], ts[1:]], axis=-1)
    zero_err = jnp.zeros((), dtype=y0.dtype)
    (_, err), ys = lax.scan(interval, (y0, zero_err), t_pairs)
    return jnp.concatenate([y0[None], ys], axis=0), err


def _rk4_step(f, t, y, h):
    k1 = f(t, y)
    k2 = f(t + 0.5 * h, y + 0.5 * h * k1)
    k3 = f(t + 0.5 * h, y + 0.5 * h * k2)
    k4 = f(t + h, y + h * k3)
    y1 = y + (h / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)
    return y1, jnp.zeros((), dtype=y.dtype)


# Dormand-Prince 5(4) tableau (same family as scipy solve_ivp's "RK45").
_DP_C = (0.0, 1 / 5, 3 / 10, 4 / 5, 8 / 9, 1.0, 1.0)
_DP_A = (
    (),
    (1 / 5,),
    (3 / 40, 9 / 40),
    (44 / 45, -56 / 15, 32 / 9),
    (19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729),
    (9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656),
    (35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84),
)
_DP_B5 = (35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84, 0.0)
_DP_B4 = (5179 / 57600, 0.0, 7571 / 16695, 393 / 640, -92097 / 339200,
          187 / 2100, 1 / 40)


def _dopri5_step(f, t, y, h):
    ks = []
    for i in range(7):
        yi = y
        for a, k in zip(_DP_A[i], ks):
            yi = yi + h * a * k
        ks.append(f(t + _DP_C[i] * h, yi))
    y5 = y
    y4 = y
    for b5, b4, k in zip(_DP_B5, _DP_B4, ks):
        y5 = y5 + h * b5 * k
        y4 = y4 + h * b4 * k
    err = jnp.max(jnp.abs(y5 - y4))
    return y5, err


def rk4_grid(f: Callable, y0: jnp.ndarray, ts: jnp.ndarray,
             substeps: int = 4) -> jnp.ndarray:
    """Classic RK4 on a fixed observation grid. Returns (len(ts), *y0.shape)."""
    ys, _ = _scan_grid(_rk4_step, f, y0, ts, substeps)
    return ys


def dopri5_grid(f: Callable, y0: jnp.ndarray, ts: jnp.ndarray,
                substeps: int = 2):
    """Dormand-Prince 5(4) on a fixed grid.

    Returns (ys, max_err): the 5th-order solution at every grid point and the
    max embedded-error estimate over the whole trajectory (divergence flag).
    """
    return _scan_grid(_dopri5_step, f, y0, ts, substeps)
