"""Michaelis-Menten enzyme-kinetics model (the reference's lightweight example).

Reference behavior being rebuilt (NOT ported):
- ODE dS/dt = -Vmax*S/(Km+S), product P = S0 - S
  (SMC_example/Micmem_likelihood.py:14-33).
- 6 pseudo-datasets, each 40 observation times on [0, 10], S0 in
  {2.0, 0.1, 0.25, 0.5, 1.0, 2.0} (dataset 0 is a duplicate of the S0=2.0
  run; the generator writes files 1..5 while the loader reads 0..5 —
  Micmen_generate_data.py:45-64 vs Micmem_settings.py:104-113).
- Gaussian iid noise likelihood per dataset:
  logL_i = -0.5*n*log(2*pi*sigma^2) - sum(r^2)/(2*sigma^2), summed over
  datasets; sigma <= 0 -> -inf (Micmem_likelihood.py:53-71).
- Priors: Uniform(0,10) on each of (Vmax, Km, sigma)
  (Micmem_settings.py:63-67); true values Vmax=1.2, Km=0.5, noise 0.02.

TPU-first design: all datasets share one observation grid, so a single
integrator call propagates the full (n_datasets,) state vector; ``vmap`` adds
the particle axis. Two simulators:
- "rk4"   — fixed-grid RK4 (parity with the reference's RK45 within solver
            tolerance; default).
- "exact" — closed-form via Lambert W (smc_tpu/ops/lambertw.py): the whole
            likelihood becomes fused elementwise VPU work, no time stepping.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from smc_tpu.ops.ode import rk4_grid
from smc_tpu.ops.lambertw import lambertw
from smc_tpu.priors import Prior

_LOG2PI = float(np.log(2 * np.pi))

MM_TRUE_VMAX = 1.2
MM_TRUE_KM = 0.5
MM_TRUE_NOISE = 0.02
# S0 per dataset as loaded by the reference (index 0 duplicates the last
# generated file's S0=2.0 — see module docstring).
MM_S0_LIST = (2.0, 0.1, 0.25, 0.5, 1.0, 2.0)


@dataclasses.dataclass(frozen=True)
class MichaelisMentenModel:
    """Batched MM log-likelihood over 6 (or n) datasets.

    obs: (n_ds, T) observed product concentrations P_obs.
    s0:  (n_ds,) initial substrate concentrations.
    ts:  (T,) shared observation grid.
    """

    obs: jnp.ndarray
    s0: jnp.ndarray
    ts: jnp.ndarray
    prior: Prior
    method: str = "rk4"
    substeps: int = 4
    # est_sigma=False fixes sigma to sigma_fixed and estimates only
    # (Vmax, Km) — the reference's est_sigma flag
    # (Micmem_settings.py:53, Micmem_likelihood.py:47-50).
    est_sigma: bool = True
    sigma_fixed: float = MM_TRUE_NOISE

    @property
    def param_names(self) -> Tuple[str, ...]:
        return (("Vmax", "Km", "sigma") if self.est_sigma
                else ("Vmax", "Km"))

    @staticmethod
    def from_csv_dir(path: str, n_ex: int = 6, method: str = "rk4",
                     substeps: int = 4) -> "MichaelisMentenModel":
        """Load the reference's dataset layout: ``{path}/mm_pseudo_data_{i}.csv``
        with columns t,S_true,P_true,P_obs for i in 0..n_ex-1
        (Micmem_settings.py:103-114). S0 is taken from the first S_true row,
        exactly as the reference does."""
        import os
        ts = None
        obs, s0 = [], []
        for i in range(n_ex):
            arr = np.loadtxt(os.path.join(path, f"mm_pseudo_data_{i}.csv"),
                             delimiter=",", skiprows=1)
            if ts is None:
                ts = arr[:, 0]
            obs.append(arr[:, 3])
            s0.append(arr[0, 1])
        prior = Prior.uniform([0.0, 0.0, 0.0], [10.0, 10.0, 10.0])
        return MichaelisMentenModel(
            obs=jnp.asarray(np.stack(obs), jnp.float32),
            s0=jnp.asarray(s0, jnp.float32),
            ts=jnp.asarray(ts, jnp.float32),
            prior=prior, method=method, substeps=substeps)

    @staticmethod
    def default(obs=None, s0=None, ts=None, method="rk4", substeps=4,
                key=None, est_sigma: bool = True) -> "MichaelisMentenModel":
        """Model with the reference's default priors/datasets.

        If obs is None, regenerates the 6 pseudo-datasets on device
        (equivalent of loading data/mm_pseudo_data_{0..5}.csv).
        """
        if obs is None:
            ts_np, obs_np, s0_np = generate_mm_pseudo_data(key=key)
            ts, obs, s0 = jnp.asarray(ts_np), jnp.asarray(obs_np), jnp.asarray(s0_np)
        d = 3 if est_sigma else 2
        prior = Prior.uniform([0.0] * d, [10.0] * d)
        return MichaelisMentenModel(obs=obs, s0=s0, ts=ts, prior=prior,
                                    method=method, substeps=substeps,
                                    est_sigma=est_sigma)

    def _loglik_one(self, theta: jnp.ndarray):
        ll, pred = self.log_likelihood(theta[None])
        return ll[0], pred[0]

    def log_likelihood(self, theta: jnp.ndarray):
        """theta (N, 3) -> (log_lik (N,), P_model (N, n_ds, T)).

        Batch-last layout: the particle axis N rides the VPU lanes — the
        integrator state is one (n_ds, N) array (no per-particle vmap), so
        every RK stage / Lambert-W iteration is a full-width elementwise op.
        """
        Vmax, Km = theta[:, 0], theta[:, 1]                      # (N,)
        sigma = (theta[:, 2] if self.est_sigma
                 else jnp.full_like(Vmax, self.sigma_fixed))
        s0 = self.s0[:, None]                                    # (n_ds, 1)
        if self.method in ("pallas", "pallas_exact"):
            # Fused VMEM-resident kernels (ops/mm_pallas.py): "pallas" = RK4
            # march, "pallas_exact" = closed-form Lambert-W. Both return ll
            # only; predictions fall back to the jnp path when requested
            # (RunManager._parity_plots does this automatically).
            from smc_tpu.ops.mm_pallas import (_exact_pallas_vmappable,
                                               mm_loglik_pallas)
            dt = float(np.asarray(self.ts)[1] - np.asarray(self.ts)[0])
            theta3 = theta if self.est_sigma else jnp.concatenate(
                [theta, jnp.full((theta.shape[0], 1), self.sigma_fixed,
                                 theta.dtype)], axis=1)
            interp = jax.default_backend() == "cpu"
            if self.method == "pallas_exact":
                # custom_vmap wrapper: the hierarchical ensemble vmaps this
                # over populations -> one batched kernel launch.
                ll = _exact_pallas_vmappable(dt, 2048, 1, interp)(
                    theta3, self.obs, self.s0)
            else:
                ll = mm_loglik_pallas(theta3, self.obs, self.s0, dt,
                                      substeps=self.substeps,
                                      interpret=interp)
            return ll, None
        if self.method == "exact":
            Km_safe = jnp.maximum(Km, 1e-8)
            logz = (jnp.log(s0 / Km_safe)[None]
                    + (s0[None] - Vmax[None, None, :] * self.ts[:, None, None])
                    / Km_safe)                                   # (T, n_ds, N)
            z = jnp.exp(jnp.clip(logz, -60.0, 60.0))
            S = Km_safe * lambertw(z)
        else:
            def f(t, S):                                         # S (n_ds, N)
                return -Vmax * S / (Km + S)
            S0 = jnp.broadcast_to(s0, (self.s0.shape[0], theta.shape[0]))
            if self.method == "dopri5":
                from smc_tpu.ops.ode import dopri5_grid
                S, _ = dopri5_grid(f, S0, self.ts,
                                   substeps=max(1, self.substeps // 2))
            else:
                S = rk4_grid(f, S0, self.ts, substeps=self.substeps)
        P_model = s0[None] - S                                   # (T, n_ds, N)
        resid = self.obs.T[:, :, None] - P_model
        n = self.obs.shape[1]
        sigma_safe = jnp.maximum(sigma, 1e-12)
        ll_ds = (-0.5 * n * (_LOG2PI + 2.0 * jnp.log(sigma_safe))
                 - jnp.sum(resid * resid, axis=0) / (2.0 * sigma_safe ** 2))
        total = jnp.sum(ll_ds, axis=0)                           # (N,)
        # sigma <= 0 -> -inf (Micmem_likelihood.py:53-54); also mask
        # non-finite trajectories (replaces solver-failure sentinels).
        bad = (sigma <= 0.0) | ~jnp.isfinite(total)
        ll = jnp.where(bad, -jnp.inf, total)
        return ll, jnp.transpose(P_model, (2, 1, 0))             # (N,n_ds,T)


def make_mm_data_loglik(ts, s0, method: str = "exact", substeps: int = 4):
    """Data-sliced likelihood for the hierarchical ensemble
    (smc_tpu/smc/ensemble.py): fn(theta (N,3), obs (n_ds,T)) -> (ll, pred)."""
    prior = Prior.uniform([0.0, 0.0, 0.0], [10.0, 10.0, 10.0])

    def fn(theta, obs):
        m = MichaelisMentenModel(obs=obs, s0=s0, ts=ts, prior=prior,
                                 method=method, substeps=substeps)
        return m.log_likelihood(theta)

    return fn


def generate_mm_pseudo_data(Vmax_true: float = MM_TRUE_VMAX,
                            Km_true: float = MM_TRUE_KM,
                            noise_std: float = MM_TRUE_NOISE,
                            s0_list=MM_S0_LIST,
                            t_span=(0.0, 10.0),
                            num_points: int = 40,
                            key=None,
                            seed: int = 20250205,
                            return_truth: bool = False):
    """Regenerate the reference's pseudo-datasets (Micmen_generate_data.py:31-66).

    The reference writes 5 CSVs with per-file NumPy seeds 20250206..20250210
    and then *loads 6* (files 0..5, where file 0 is a stale duplicate of the
    S0=2.0 run with a different noise draw). We reproduce that structure: the
    true trajectories are identical for the duplicated S0; noise draws are
    counter-based per dataset.

    Returns (ts (T,), obs (n_ds, T), s0 (n_ds,)) as NumPy arrays.
    """
    ts = np.linspace(t_span[0], t_span[1], num_points)
    s0 = np.asarray(s0_list, np.float64)
    # True trajectories via the closed form (exact; replaces scipy RK45).
    Km = Km_true
    logz = np.log(s0 / Km)[None, :] + (s0[None, :] - Vmax_true * ts[:, None]) / Km
    z = np.exp(np.clip(logz, -60, 60))
    S_true = Km * np.asarray(lambertw(jnp.asarray(z)))
    P_true = (s0[None, :] - S_true).T  # (n_ds, T)
    if key is None:
        key = jax.random.key(seed)
    noise = jax.random.normal(key, P_true.shape) * noise_std
    obs = P_true + np.asarray(noise)
    out = (ts.astype(np.float32), obs.astype(np.float32),
           s0.astype(np.float32))
    if return_truth:
        return out + (S_true.T.astype(np.float32),)  # (n_ds, T)
    return out
