"""Run diagnostics helpers.

The reference's failure/ health signals: the lost-in-worker ``errorbox`` of
failed solves (methanation_set_likelihood.py:141,239-240 — appended in Ray
workers and never returned, a latent bug SURVEY.md §5 flags), the ESS
warning (SMC_methanation_main.py:239-240) and the tempering-incomplete
warning (:426-427). Here they are pure functions over device arrays.
"""
from __future__ import annotations

import jax.numpy as jnp

FAILURE_SENTINEL = -10000.0


def normalized_ess(weights: jnp.ndarray) -> jnp.ndarray:
    """ESS / N for normalized weights."""
    n = weights.shape[0]
    return 1.0 / (jnp.sum(weights * weights) * n)


def unique_ancestor_fraction(ancestors: jnp.ndarray) -> jnp.ndarray:
    """Fraction of distinct particles surviving resampling (degeneracy
    monitor): |unique(ancestors)| / N without a sort — a particle survives
    iff it received at least one offspring slot."""
    n = ancestors.shape[0]
    hit = jnp.zeros(n, jnp.int32).at[ancestors].max(1, mode="drop")
    return jnp.sum(hit) / n


def failed_solve_count(flows: jnp.ndarray) -> jnp.ndarray:
    """Number of (particle, condition) simulator failures, identified by the
    -10000 sentinel (the recovered 'errorbox' count). flows (..., 5, n_data)."""
    failed = jnp.all(flows == FAILURE_SENTINEL, axis=-2)
    return jnp.sum(failed)
