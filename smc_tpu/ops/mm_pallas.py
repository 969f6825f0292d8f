"""Pallas TPU kernel: fused Michaelis-Menten log-likelihood.

The jnp RK4 path executes ~624 sequential elementwise ops on a (n_ds, B)
state, each round-tripping the state through HBM — bandwidth-bound. This
kernel keeps the state, parameters, and running residual accumulators
resident in VMEM for the whole trajectory: one HBM read of (theta, obs), one
HBM write of ll. The entire likelihood (the reference's per-particle scipy
solve_ivp + Gaussian sum, Micmem_likelihood.py:35-77) becomes a single
compute-bound kernel.

Assumes the shared uniform observation grid the MM datasets use
(t = linspace(0, 10, T), Micmen_generate_data.py:16).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LOG2PI = float(np.log(2 * np.pi))


def _mm_kernel(vmax_ref, km_ref, sig_ref, s0_ref, obs_ref, ll_ref, *,
               n_obs: int, dt: float, substeps: int, n_ds: int):
    Vmax = vmax_ref[:]            # (1, Bt)
    Km = km_ref[:]                # (1, Bt)
    s0 = s0_ref[:]                # (n_ds, 1)
    S = jnp.broadcast_to(s0, (n_ds, Vmax.shape[1]))  # (n_ds, Bt)
    acc0 = jnp.zeros((n_ds, Vmax.shape[1]), S.dtype)

    h = dt / substeps

    def f(S):
        return -Vmax * S / (Km + S)

    # Fully static unroll over the observation grid (Mosaic forbids dynamic
    # lane-dim indexing of obs_ref; n_obs is small and static, so constant
    # indices compile cleanly and the whole march fuses in VMEM).
    obs = obs_ref[:]                                  # (n_ds, n_obs)
    r0 = obs[:, 0:1] - (s0 - S)
    acc = acc0 + r0 * r0
    for i in range(n_obs - 1):
        for _ in range(substeps):
            k1 = f(S)
            k2 = f(S + 0.5 * h * k1)
            k3 = f(S + 0.5 * h * k2)
            k4 = f(S + h * k3)
            S = S + (h / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)
        r = obs[:, i + 1:i + 2] - (s0 - S)
        acc = acc + r * r

    sigma = jnp.maximum(sig_ref[:], 1e-12)          # (1, Bt)
    ll = (-0.5 * n_obs * n_ds * (_LOG2PI + 2.0 * jnp.log(sigma))
          - jnp.sum(acc, axis=0, keepdims=True) / (2.0 * sigma * sigma))
    bad = (sig_ref[:] <= 0.0) | ~(ll == ll)
    ll_ref[:] = jnp.where(bad, -jnp.inf, ll)


@functools.partial(jax.jit, static_argnames=("dt", "substeps", "block",
                                             "interpret"))
def mm_loglik_pallas(theta: jnp.ndarray, obs: jnp.ndarray, s0: jnp.ndarray,
                     dt: float, substeps: int = 4, block: int = 8192,
                     interpret: bool = False) -> jnp.ndarray:
    """theta (N, 3), obs (n_ds, T), s0 (n_ds,), dt = uniform grid spacing
    -> ll (N,)."""
    n = theta.shape[0]
    n_ds, n_obs = obs.shape
    block = min(block, n)
    n_pad = -(-n // block) * block
    if n_pad != n:
        pad = jnp.ones((n_pad - n, 3), theta.dtype)
        theta = jnp.concatenate([theta, pad], axis=0)

    kern = functools.partial(_mm_kernel, n_obs=n_obs, dt=dt,
                             substeps=substeps, n_ds=n_ds)
    grid = (n_pad // block,)
    lane_spec = pl.BlockSpec((1, block), lambda i: (0, i),
                             memory_space=pltpu.VMEM)
    ll = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            lane_spec, lane_spec, lane_spec,
            pl.BlockSpec((n_ds, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_ds, n_obs), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=lane_spec,
        out_shape=jax.ShapeDtypeStruct((1, n_pad), theta.dtype),
        interpret=interpret,
    )(theta[:, 0][None], theta[:, 1][None], theta[:, 2][None],
      s0[:, None], obs)
    return ll[0, :n]
