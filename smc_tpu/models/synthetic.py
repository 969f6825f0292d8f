"""Synthetic stress targets for the SMC machinery (BASELINE.json config 3:
"banana/Gaussian-mixture target — stress adaptive tempering + resampling
degeneracy"). No ODE: the "likelihood" is an analytic log-density, so these
isolate the sampler from the simulator.

They stress exactly what the reference never tests:
- banana: strong nonlinear ridge — adaptive covariance RW-MH must track a
  curved, narrowing support as gamma rises;
- Gaussian mixture: well-separated modes — the tempering schedule must stay
  slow enough that resampling doesn't collapse onto one mode too early.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from smc_tpu.priors import Prior

_LOG2PI = float(np.log(2 * np.pi))


@dataclasses.dataclass(frozen=True)
class BananaModel:
    """Rosenbrock-banana target: ll(x) = -(a - x0)^2/s0 - b(x1 - x0^2)^2.

    With the default wide uniform prior the tempered posterior contracts
    onto the parabola x1 = x0^2.
    """
    a: float = 1.0
    b: float = 20.0
    scale0: float = 1.0
    prior: Prior = dataclasses.field(
        default_factory=lambda: Prior.uniform([-6.0, -10.0], [6.0, 40.0]))
    param_names: Tuple[str, ...] = ("x0", "x1")

    def log_likelihood(self, theta: jnp.ndarray):
        x0, x1 = theta[:, 0], theta[:, 1]
        ll = -(self.a - x0) ** 2 / self.scale0 \
            - self.b * (x1 - x0 ** 2) ** 2
        return ll, None


@dataclasses.dataclass(frozen=True)
class GaussianMixtureModel:
    """K well-separated isotropic Gaussians in d dims with given weights.

    means: (K, d); stds: (K,); weights: (K,).
    """
    means: jnp.ndarray
    stds: jnp.ndarray
    log_weights: jnp.ndarray
    prior: Prior
    param_names: Tuple[str, ...] = ()

    @staticmethod
    def default(k: int = 4, d: int = 2, sep: float = 8.0,
                std: float = 0.5) -> "GaussianMixtureModel":
        ang = np.linspace(0, 2 * np.pi, k, endpoint=False)
        means = np.zeros((k, d), np.float32)
        means[:, 0] = sep * np.cos(ang)
        means[:, 1 % d] = sep * np.sin(ang)
        lim = sep + 6 * std
        return GaussianMixtureModel(
            means=jnp.asarray(means),
            stds=jnp.full((k,), std, jnp.float32),
            log_weights=jnp.full((k,), -np.log(k), jnp.float32),
            prior=Prior.uniform([-lim] * d, [lim] * d),
            param_names=tuple(f"x{i}" for i in range(d)),
        )

    def log_likelihood(self, theta: jnp.ndarray):
        d = theta.shape[1]
        diff = theta[:, None, :] - self.means[None, :, :]     # (N, K, d)
        maha = jnp.sum(diff * diff, axis=-1) / self.stds ** 2  # (N, K)
        logp_k = (self.log_weights - 0.5 * maha
                  - d * (0.5 * _LOG2PI + jnp.log(self.stds)))
        return jax.nn.logsumexp(logp_k, axis=1), None

    def mode_fractions(self, theta: jnp.ndarray) -> jnp.ndarray:
        """Fraction of particles nearest each mode (mode-coverage metric)."""
        diff = theta[:, None, :] - self.means[None, :, :]
        nearest = jnp.argmin(jnp.sum(diff * diff, -1), axis=1)
        return jnp.mean(
            jax.nn.one_hot(nearest, self.means.shape[0]), axis=0)
