"""SMC hyperparameter configuration.

TPU-first rewrite of the reference's implicit config surface
(reference: SMC_methanation/methanation_set_conditon.py:105-132 and
SMC_example/Micmem_settings.py:15-31 — module-level globals imported with
``from X import *`` and import-time side effects). Here the config is a
frozen dataclass with no side effects; every field is a static (non-traced)
hyperparameter so a single ``SMCConfig`` pins one XLA compilation.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class SMCConfig:
    """Hyperparameters of the likelihood-tempered SMC sampler.

    Field-by-field parity with the reference knobs
    (methanation_set_conditon.py:105-132):

    - ``n_particles``      <- n_particle (1000)
    - ``ess_limit``        <- ess_limit (0.5): ESS/N threshold that the adaptive
      tempering search must exceed.
    - ``d_gamma_max``      <- d_gamma_max (1.0): max tempering increment per step.
    - ``gamma_reduction_rate`` <- gm_reduction_rate (0.7): shrink factor applied to
      the gamma increment when ESS is too low.
    - ``gamma_reduction_iters`` <- gm_reduction_itr (80): max shrink iterations.
    - ``mh_steps``         <- mhstep_num (5): RW-MH mutation sweeps while gamma<1.
    - ``mh_steps_final``   <- ad_mhstep_num (20): sweeps at gamma==1.
    - ``mh_cov_diag``      <- mhstep_factor (0.5): proposal covariance scaling on
      the diagonal of the empirical particle covariance.
    - ``mh_cov_offdiag``   <- mhstep_factor_cov (0.5): same, off-diagonal.
    - ``accept_threshold`` <- r_threshold (0.5): early-stop when the fraction of
      particles that accepted at least once exceeds this.
    - ``accept_threshold_final`` <- r_threshold_f (0.7): same at gamma==1.
    - ``accept_threshold_min``   <- r_threshold_min (0.1): if the accepted
      fraction is below this after a sweep, halve the proposal step ratio.
    - ``mh_ratio_decay``   <- the hard-coded 0.5 at Micmem_SMC_main.py:248.
    - ``max_steps``        <- itr_max (50): max outer SMC steps.
    """

    n_particles: int = 1000
    ess_limit: float = 0.5
    d_gamma_max: float = 1.0
    gamma_reduction_rate: float = 0.7
    gamma_reduction_iters: int = 80
    mh_steps: int = 5
    mh_steps_final: int = 20
    mh_cov_diag: float = 0.5
    mh_cov_offdiag: float = 0.5
    accept_threshold: float = 0.5
    accept_threshold_final: float = 0.7
    accept_threshold_min: float = 0.1
    mh_ratio_decay: float = 0.5
    max_steps: int = 50
    # Resampling scheme: "residual_systematic" (the reference's Algorithm 2)
    # or the "systematic" / "stratified" / "multinomial" variants.
    # "ring" = residual-systematic with the O(N/S)-per-chip ring-exchange
    # particle redistribution (parallel/resample_shmap.py) when the run is
    # sharded; identical results (bitwise) to "residual_systematic".
    resampling: str = "residual_systematic"
    # Mutation kernel: "rwm" = the reference's adaptive random-walk
    # Metropolis (Micmem_SMC_main.py:186-251). "mala" = preconditioned
    # Metropolis-adjusted Langevin (gradient drift through the simulator —
    # requires a differentiable log_likelihood; see smc.kernels.mala_mutation).
    # "hmc" = preconditioned Hamiltonian mutation (hmc_leapfrog gradient
    # steps per proposal; see smc.kernels.hmc_mutation).
    mutation: str = "rwm"
    # Leapfrog steps per HMC proposal (only used when mutation == "hmc").
    hmc_leapfrog: int = 5
    # Particles per device execution under run_smc(granularity="block"):
    # each mutation sweep's likelihood work is split into n_particles /
    # block_particles bounded executions (the single-chip tunnel kills any
    # execution over ~100 s — docs/PERF.md "Execution-duration limit" —
    # and at N >= 1e6 even ONE methanation sweep exceeds that). None means
    # one block = all particles (the "sweep" bound). Must divide
    # n_particles. Identical math/PRNG stream to the other granularities.
    block_particles: Any = None
    dtype: Any = jnp.float32

    def __post_init__(self):
        if self.n_particles < 2:
            raise ValueError("n_particles must be >= 2")
        if not (0.0 < self.ess_limit <= 1.0):
            raise ValueError("ess_limit must be in (0, 1]")
        if not (0.0 < self.gamma_reduction_rate < 1.0):
            raise ValueError("gamma_reduction_rate must be in (0, 1)")
        if self.mh_steps < 1 or self.mh_steps_final < 1:
            raise ValueError("mh_steps / mh_steps_final must be >= 1")
        if self.resampling not in ("residual_systematic", "ring",
                                   "systematic", "stratified",
                                   "multinomial"):
            raise ValueError(f"unknown resampling {self.resampling!r}")
        if self.mutation not in ("rwm", "mala", "hmc"):
            raise ValueError(f"unknown mutation {self.mutation!r}")
        if self.hmc_leapfrog < 1:
            raise ValueError("hmc_leapfrog must be >= 1")
        if self.block_particles is not None:
            if (self.block_particles < 1
                    or self.n_particles % self.block_particles):
                raise ValueError("block_particles must divide n_particles")
        if not jnp.issubdtype(jnp.dtype(self.dtype), jnp.floating):
            raise ValueError(
                f"dtype must be a floating dtype, got {self.dtype!r}")
        if jnp.dtype(self.dtype) == jnp.float64:
            import jax
            if not jax.config.jax_enable_x64:
                raise ValueError(
                    "dtype=float64 requires jax_enable_x64 "
                    "(jax.config.update('jax_enable_x64', True) before "
                    "building the config); without it every operation "
                    "silently truncates to float32")

    @property
    def evals_per_sweep(self) -> int:
        """Likelihood evaluations per mutation sweep (cost accounting):
        RWM/MALA evaluate once per sweep; HMC evaluates once per leapfrog
        step (gradients ride the same evaluations as VJPs)."""
        return self.hmc_leapfrog if self.mutation == "hmc" else 1

    def cov_weight(self, d: int) -> jnp.ndarray:
        """Proposal-covariance elementwise weight matrix.

        Mirrors the ``w_cov`` construction at methanation_set_conditon.py:129-132:
        off-diagonal entries ``mh_cov_offdiag``, diagonal ``mh_cov_diag``.
        """
        w = jnp.full((d, d), self.mh_cov_offdiag, dtype=self.dtype)
        return w.at[jnp.arange(d), jnp.arange(d)].set(self.mh_cov_diag)

    def replace(self, **kw) -> "SMCConfig":
        return dataclasses.replace(self, **kw)
