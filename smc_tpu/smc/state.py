"""SMC sampler state pytree.

The reference carries its loop state as loose module-level NumPy arrays
(p_pred, p_filt, p_weight, lk, gamma_old/new — e.g.
SMC_example/Micmem_settings.py:118-127, Micmem_SMC_main.py:105-262).
Here it is one immutable pytree so a whole SMC step is a pure
``SMCState -> SMCState`` function: jittable, shardable (particles/log_lik
carry the particle-axis sharding), checkpointable, and resumable.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SMCState:
    particles: jnp.ndarray   # (N, d) current particle positions (p_pred/p_filt)
    log_lik: jnp.ndarray     # (N,)   cached untempered log-likelihoods (lk)
    gamma: jnp.ndarray       # ()     current tempering exponent in [0, 1]
    key: jax.Array           # PRNG key (counter-based; replaces global np seed)
    step: jnp.ndarray        # ()     int32 outer SMC iteration counter
    # --- per-step diagnostics (the reference's console metric line, C26) ---
    ess: jnp.ndarray              # () normalized ESS in (0, 1] after gamma search
    max_log_lik: jnp.ndarray      # ()
    n_mh: jnp.ndarray             # () int32 MH sweeps actually used last step
    accepted: jnp.ndarray         # () number of particles that accepted >= once
    n_gamma_reductions: jnp.ndarray  # () int32 gamma shrink iterations used
    mh_ratio: jnp.ndarray         # () final proposal step ratio last step
    total_lik_evals: jnp.ndarray  # () int64-ish f32 count of per-particle
    # likelihood evaluations so far (N per sweep; the bench denominator)
    # Running log marginal-likelihood (evidence) estimate: the standard
    # SMC identity log Z = sum_k log( (1/N) sum_i exp(dgamma_k * ll_i) ),
    # accumulated from each tempering step's UNnormalized incremental
    # weights (kernels.find_gamma log_z_inc). The reference never computes
    # this; tempered SMC yields it for free and it is the quantity model
    # comparison needs. Exact value at gamma=1 estimates P(y | model).
    log_evidence: jnp.ndarray     # ()

    @property
    def n_particles(self) -> int:
        return self.particles.shape[0]

    @property
    def dim(self) -> int:
        return self.particles.shape[1]

    def replace(self, **kw) -> "SMCState":
        return dataclasses.replace(self, **kw)
