"""Model interface: the SMC "forward pass".

The reference funnels every weighting/mutation sweep through one choke point,
``sim_particle(particles) -> (log_lik tuple, predictions tuple)``
(SMC_example/Micmem_likelihood.py:79-92,
SMC_methanation/methanation_functions.py:70-92) — a Ray task per particle.

Here the contract is a pure, jittable batched function:

    log_likelihood(theta: (N, d)) -> (log_lik: (N,), predictions pytree)

Implementations build the batch axis with ``vmap`` over an on-device
simulator, so the particle axis can be sharded over a device mesh and the
scatter/gather of the Ray pattern disappears into pjit. Predictions are kept
(as in the reference) only for parity plots and diagnostics.
"""
from __future__ import annotations

from typing import Protocol, Tuple, Any

import jax.numpy as jnp

from smc_tpu.priors import Prior


class Model(Protocol):
    """A Bayesian inverse problem: prior + batched log-likelihood."""

    prior: Prior

    def log_likelihood(self, theta: jnp.ndarray) -> Tuple[jnp.ndarray, Any]:
        """theta (N, d) -> (log_lik (N,), predictions pytree with leading N)."""
        ...

    @property
    def param_names(self) -> Tuple[str, ...]:
        ...
