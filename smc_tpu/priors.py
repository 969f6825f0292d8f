"""Vectorized prior API.

TPU-first replacement for the reference's three divergent prior paths:
- PyMC-style dict + scipy pdf products (SMC_example/Micmem_settings.py:63-87,
  Micmem_SMC_main.py:60-90),
- uniform bounds from ``use_params +- use_params*k``
  (SMC_methanation/methanation_set_conditon.py:61-70),
- normal/"taylor" mixed modes (SMC_methanation/methanation_functions.py:96-135).

Here a prior over d parameters is a single struct-of-arrays pytree: per-dim
kind codes plus (low, high) / (loc, scale) arrays. ``sample`` and ``log_pdf``
are pure, jittable, and broadcast over arbitrary particle batches, so the
per-dim branch is a ``jnp.where`` over lanes rather than Python control flow —
XLA fuses the whole prior evaluation into the surrounding kernel.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Sequence

import jax
import jax.numpy as jnp

UNIFORM = 0
NORMAL = 1

# Host constant — importing smc_tpu must NEVER touch a device (a jnp.log
# here would initialize the default backend as an import side effect).
_LOG2PI = math.log(2 * math.pi)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Prior:
    """Independent per-dimension prior: struct-of-arrays over dims.

    ``kind[i]`` selects UNIFORM (params = low/high) or NORMAL (params =
    loc/scale). Unused slots hold harmless placeholder values.
    """

    kind: jnp.ndarray   # (d,) int32
    low: jnp.ndarray    # (d,) f32 — uniform support lower bound; -inf for normal
    high: jnp.ndarray   # (d,) f32 — uniform support upper bound; +inf for normal
    loc: jnp.ndarray    # (d,) f32
    scale: jnp.ndarray  # (d,) f32

    @property
    def dim(self) -> int:
        return self.kind.shape[0]

    # ---- constructors -------------------------------------------------
    @staticmethod
    def uniform(low, high) -> "Prior":
        low = jnp.asarray(low, jnp.float32)
        high = jnp.asarray(high, jnp.float32)
        d = low.shape[0]
        return Prior(
            kind=jnp.full((d,), UNIFORM, jnp.int32),
            low=low, high=high,
            loc=(low + high) / 2, scale=(high - low),
        )

    @staticmethod
    def normal(loc, scale) -> "Prior":
        loc = jnp.asarray(loc, jnp.float32)
        scale = jnp.asarray(scale, jnp.float32)
        d = loc.shape[0]
        inf = jnp.full((d,), jnp.inf, jnp.float32)
        return Prior(
            kind=jnp.full((d,), NORMAL, jnp.int32),
            low=-inf, high=inf, loc=loc, scale=scale,
        )

    @staticmethod
    def from_specs(specs: Sequence[dict]) -> "Prior":
        """Build from PyMC-style dicts, e.g.
        ``[{"dist": "uniform", "low": 0, "high": 10},
           {"dist": "normal", "mu": 1.0, "sigma": 0.1}]``
        (mirrors the dict schema at Micmem_settings.py:63-67)."""
        kind, low, high, loc, scale = [], [], [], [], []
        for s in specs:
            if s["dist"] == "uniform":
                kind.append(UNIFORM)
                low.append(float(s["low"]))
                high.append(float(s["high"]))
                loc.append((float(s["low"]) + float(s["high"])) / 2)
                scale.append(float(s["high"]) - float(s["low"]))
            elif s["dist"] == "normal":
                kind.append(NORMAL)
                low.append(-jnp.inf)
                high.append(jnp.inf)
                loc.append(float(s.get("mu", s.get("loc", 0.0))))
                scale.append(float(s.get("sigma", s.get("scale", 1.0))))
            else:
                raise ValueError(f"Unknown prior dist: {s['dist']!r}")
        return Prior(
            kind=jnp.asarray(kind, jnp.int32),
            low=jnp.asarray(low, jnp.float32),
            high=jnp.asarray(high, jnp.float32),
            loc=jnp.asarray(loc, jnp.float32),
            scale=jnp.asarray(scale, jnp.float32),
        )

    # ---- kernels -------------------------------------------------------
    def sample(self, key: jax.Array, n: int, dtype=jnp.float32) -> jnp.ndarray:
        """Draw (n, d) particles from the prior (counter-based PRNG; replaces
        the reference's global-seed NumPy draws, Micmem_settings.py:69-87)."""
        ku, kn = jax.random.split(key)
        u = jax.random.uniform(ku, (n, self.dim), dtype=dtype)
        z = jax.random.normal(kn, (n, self.dim), dtype=dtype)
        uni = self.low + u * (self.high - self.low)
        nor = self.loc + z * self.scale
        return jnp.where(self.kind == UNIFORM, uni, nor)

    def log_pdf(self, theta: jnp.ndarray) -> jnp.ndarray:
        """Log prior density, summed over dims. theta: (..., d) -> (...,).

        -inf outside uniform support (this is what drives the reference's
        support-clipping mask ``p0 = p0_2 > 0``, Micmem_SMC_main.py:226)."""
        inside = (theta >= self.low) & (theta <= self.high)
        log_uni = jnp.where(inside, -jnp.log(self.high - self.low), -jnp.inf)
        z = (theta - self.loc) / self.scale
        log_nor = -0.5 * (z * z + _LOG2PI) - jnp.log(self.scale)
        per_dim = jnp.where(self.kind == UNIFORM, log_uni, log_nor)
        return jnp.sum(per_dim, axis=-1)

    def in_support(self, theta: jnp.ndarray) -> jnp.ndarray:
        """Boolean support mask, (..., d) -> (...,)."""
        ok = (theta >= self.low) & (theta <= self.high)
        return jnp.all(jnp.where(self.kind == UNIFORM, ok, True), axis=-1)
