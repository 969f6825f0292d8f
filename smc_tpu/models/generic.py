"""Generic user-defined ODE inverse problem: bring an ``rhs``, get SMC.

The reference supports exactly two hard-wired applications (the MM enzyme
example and the methanation reactor); adding a third means copy-pasting a
main script and a likelihood module (SURVEY.md §1 — the three entry
scripts are ~90% duplicates). Here the equivalent is one constructor:
define the ODE right-hand side as a pure jnp function, give observations
and a prior, and every framework capability (fused whole-run programs,
mesh sharding, checkpoint/resume, evidence, plots) applies unchanged.

Layout contract (the TPU-critical part, enforced by construction): the
integrator state is one ``(state_dim, n_series, N)`` array — particles on
the LAST (lane) axis — so a user rhs written with ordinary elementwise
jnp ops is automatically full-VPU-width with no per-particle vmap
(see CLAUDE.md: the vmap-of-small-blocks layout wastes ~94% of the VPU).

Example (Lotka-Volterra, also available as ``lotka_volterra_model()``)::

    def rhs(t, y, p):                    # y: (2, n_series, N)
        prey, pred = y[0], y[1]
        dprey = p["alpha"] * prey - p["beta"] * prey * pred
        dpred = p["delta"] * prey * pred - p["gamma"] * pred
        return jnp.stack([dprey, dpred])

    model = ODEModel(rhs=rhs, param_names=("alpha", "beta", "delta",
                                           "gamma", "sigma"),
                     prior=Prior.uniform([0]*5, [2, 0.2, 0.2, 2, 1]),
                     obs=obs, ts=ts, y0=y0)
    state = run_smc(model, SMCConfig(n_particles=4096), jax.random.key(0))

Gaussian iid observation noise matches the reference's likelihood shape
(SMC_example/Micmem_likelihood.py:53-71): sigma is the trailing parameter
when ``est_sigma`` (else fixed), logL includes the 2*pi normalizer, and
sigma <= 0 or a non-finite trajectory yields -inf (never NaN — the
tempering/resampling invariant).
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from smc_tpu.ops.implicit_ode import bdf2_grid, make_consistent
from smc_tpu.ops.ode import dopri5_grid, rk4_grid
from smc_tpu.priors import Prior

_LOG2PI = float(np.log(2 * np.pi))


def _observe_first(y):
    """Default observable: the first state component, (n_series, N)."""
    return y[0]


@dataclasses.dataclass(frozen=True)
class ODEModel:
    """SMC model for dy/dt = rhs(t, y, params) with Gaussian obs noise.

    rhs: (t, y (state_dim, n_series, N), params dict name->(N,)) -> dy,
         pure/jittable elementwise jnp ops (broadcast over the trailing
         particle axis).
    param_names: names in theta column order; if ``est_sigma`` the LAST
         name is the noise std. ``params`` passed to rhs excludes sigma.
    obs: (n_series, T) observations of ``observe(y)`` on grid ``ts``.
    y0:  (state_dim, n_series) initial conditions per series.
    observe: y (state_dim, n_series, N) -> (n_series, N) observable at one
         grid time (default: first state component).
    method: "rk4" (default), "dopri5" (returns an embedded error
         estimate; trajectories past ``err_tol`` are masked to -inf), or
         "bdf2" (implicit, stiff-capable — ops/implicit_ode.bdf2_grid;
         the per-particle Newton residual feeds the same err_tol mask).
    alg_mask: optional (state_dim,) bools — True rows are ALGEBRAIC
         constraints ``0 = rhs_i`` (semi-explicit index-1 DAE; requires
         method="bdf2"). y0 is projected onto the constraint manifold by
         an IDA-style consistent-initialization Newton solve
         (ops/implicit_ode.make_consistent) before integrating, and its
         residual joins the err_tol divergence mask.
    jac: optional analytic Jacobian ``(t, y, params) -> [col_0, ...,
         col_{n-1}]`` (each column (state_dim, n_series, N)) for the bdf2
         Newton solves; default builds columns with ``jax.linearize``
         tangent passes (n per iteration) — analytic columns save that
         when the rhs is expensive.
    """

    rhs: Callable
    param_names: Tuple[str, ...]
    prior: Prior
    obs: jnp.ndarray
    ts: jnp.ndarray
    y0: jnp.ndarray
    observe: Callable = _observe_first
    method: str = "rk4"
    substeps: int = 4
    est_sigma: bool = True
    sigma_fixed: float = 1.0
    err_tol: float = jnp.inf
    alg_mask: Optional[Tuple[bool, ...]] = None
    jac: Optional[Callable] = None

    def __post_init__(self):
        if self.alg_mask is not None and self.method != "bdf2":
            raise ValueError("alg_mask (DAE rows) requires method='bdf2'")

    def _split(self, theta: jnp.ndarray):
        names = (self.param_names[:-1] if self.est_sigma
                 else self.param_names)
        params = {nm: theta[:, i] for i, nm in enumerate(names)}
        sigma = (theta[:, len(names)] if self.est_sigma
                 else jnp.full(theta.shape[:1], self.sigma_fixed,
                               theta.dtype))
        return params, sigma

    def simulate(self, theta: jnp.ndarray):
        """theta (N, d) -> (y_obs (T, n_series, N), max_err).

        max_err is () for rk4/dopri5 (global embedded-error estimate) and
        (n_series, N) for bdf2 (per-lane Newton residual) — both broadcast
        against the (N,) log-lik in the err_tol divergence mask."""
        params, _ = self._split(theta)

        def f(t, y):
            return self.rhs(t, y, params)

        jac = (None if self.jac is None
               else lambda t, y: self.jac(t, y, params))
        n = theta.shape[0]
        Y0 = jnp.broadcast_to(self.y0[..., None].astype(theta.dtype),
                              self.y0.shape + (n,))
        if self.method == "bdf2":
            err0 = None
            if self.alg_mask is not None:
                Y0, err0 = make_consistent(f, Y0, self.ts[0], self.alg_mask,
                                           jac=jac)
            ys, err = bdf2_grid(f, Y0, self.ts.astype(theta.dtype),
                                substeps=self.substeps,
                                alg_mask=self.alg_mask, jac=jac)
            if err0 is not None:
                err = jnp.maximum(err, err0)
        elif self.method == "dopri5":
            ys, err = dopri5_grid(f, Y0, self.ts.astype(theta.dtype),
                                  substeps=max(1, self.substeps // 2))
        else:
            ys = rk4_grid(f, Y0, self.ts.astype(theta.dtype),
                          substeps=self.substeps)
            err = jnp.zeros((), theta.dtype)
        return jax.vmap(self.observe)(ys), err

    def log_likelihood(self, theta: jnp.ndarray):
        """theta (N, d) -> (log_lik (N,), predictions (N, n_series, T))."""
        _, sigma = self._split(theta)
        y_path, err = self.simulate(theta)            # (T, n_series, N)
        resid = self.obs.T[:, :, None] - y_path
        n_pts = self.obs.shape[1]
        sigma_safe = jnp.maximum(sigma, 1e-12)
        ll_series = (-0.5 * n_pts * (_LOG2PI + 2.0 * jnp.log(sigma_safe))
                     - jnp.sum(resid * resid, axis=0)
                     / (2.0 * sigma_safe ** 2))       # (n_series, N)
        total = jnp.sum(ll_series, axis=0)
        if err.ndim:                                  # bdf2: (n_series, N)
            err = jnp.max(err, axis=tuple(range(err.ndim - 1)))
        bad = (sigma <= 0.0) | ~jnp.isfinite(total) | (err > self.err_tol)
        ll = jnp.where(bad, -jnp.inf, total)
        return ll, jnp.transpose(y_path, (2, 1, 0))

    def generate_data(self, theta_true, key, noise_std: float):
        """Synthetic observations at ``theta_true`` (+ iid noise) on self.ts.

        Returns a new ODEModel with ``obs`` replaced (the reference's
        synthetic-data pattern, SMC_methanation_main.py:86-107)."""
        th = jnp.asarray(theta_true, jnp.float32)[None]
        y_path, _ = self.simulate(th)                 # (T, n_series, 1)
        truth = y_path[..., 0].T                      # (n_series, T)
        obs = truth + noise_std * jax.random.normal(key, truth.shape)
        return dataclasses.replace(self, obs=obs)


# -- Demo instance: Lotka-Volterra predator-prey -----------------------------

LV_TRUE = (1.0, 0.1, 0.075, 1.5)     # alpha, beta, delta, gamma
LV_TRUE_NOISE = 0.25


def lotka_volterra_rhs(t, y, p):
    prey, pred = y[0], y[1]
    dprey = p["alpha"] * prey - p["beta"] * prey * pred
    dpred = p["delta"] * prey * pred - p["gamma"] * pred
    return jnp.stack([dprey, dpred])


def lotka_volterra_model(key=None, n_series: int = 3, n_points: int = 50,
                         method: str = "rk4", substeps: int = 8,
                         noise_std: float = LV_TRUE_NOISE) -> ODEModel:
    """Ready-made third model family: LV dynamics, 3 initial conditions,
    noisy prey observations, Uniform priors bracketing the truth."""
    ts = jnp.linspace(0.0, 12.0, n_points)
    y0 = jnp.asarray([[10.0, 8.0, 12.0],             # prey per series
                      [5.0, 6.0, 4.0]], jnp.float32)  # predators
    prior = Prior.uniform([0.1, 0.01, 0.01, 0.1, 0.01],
                          [3.0, 0.5, 0.5, 3.0, 2.0])
    m = ODEModel(rhs=lotka_volterra_rhs,
                 param_names=("alpha", "beta", "delta", "gamma", "sigma"),
                 prior=prior, obs=jnp.zeros((n_series, n_points)),
                 ts=ts, y0=y0[:, :n_series], method=method,
                 substeps=substeps)
    if key is None:
        key = jax.random.key(20250205)
    return m.generate_data(LV_TRUE + (0.0,), key, noise_std)


# -- Demo instance: Robertson stiff chemical kinetics ------------------------
#
# The classic stiff-ODE benchmark (rate constants spanning 9 orders of
# magnitude; explicit steppers need ~k2*t_final ~ 1e11 substeps where BDF2
# takes a few hundred). Exercises the method="bdf2" path end-to-end: the
# reference's own stiff problem goes through SUNDIALS IDA on the host
# (methanation_set_likelihood.py:169); here a USER-defined stiff model gets
# the on-device implicit integrator with no bespoke engine code.

ROBERTSON_TRUE = (np.log10(0.04), np.log10(3e7), np.log10(1e4))
ROBERTSON_TRUE_NOISE = 0.01


def robertson_rhs(t, y, p):
    k1 = 10.0 ** p["lk1"]
    k2 = 10.0 ** p["lk2"]
    k3 = 10.0 ** p["lk3"]
    a, b, c = y[0], y[1], y[2]
    da = -k1 * a + k3 * b * c
    dc = k2 * b * b
    return jnp.stack([da, -da - dc, dc])


def _robertson_observe(y):
    # Scale the 3.6e-5-peak intermediate to O(0.1) so one shared Gaussian
    # sigma is meaningful across all three observed species.
    return jnp.stack([y[0, 0], 1e4 * y[1, 0], y[2, 0]])


def robertson_dae_rhs(t, y, p):
    """Robertson in its standard semi-explicit DAE form: the third row is
    the mass-conservation ALGEBRAIC constraint a+b+c = 1 instead of dc/dt
    (the form SUNDIALS IDA ships as its own example problem — the same
    engine the reference delegates its stiff model to,
    methanation_set_likelihood.py:169)."""
    k1 = 10.0 ** p["lk1"]
    k2 = 10.0 ** p["lk2"]
    k3 = 10.0 ** p["lk3"]
    a, b, c = y[0], y[1], y[2]
    da = -k1 * a + k3 * b * c
    db = k1 * a - k3 * b * c - k2 * b * b
    return jnp.stack([da, db, a + b + c - 1.0])


def robertson_model(key=None, n_points: int = 25, substeps: int = 6,
                    noise_std: float = ROBERTSON_TRUE_NOISE,
                    form: str = "ode") -> ODEModel:
    """Stiff demo: infer log10 rate constants of the Robertson system from
    noisy observations of all three species on a log-spaced time grid.

    form="dae" uses the semi-explicit DAE formulation (third row the
    algebraic conservation constraint, ``alg_mask``) with IDA-style
    consistent initialization — same posterior, exercises the generic
    user-DAE path."""
    ts = jnp.concatenate([jnp.zeros((1,)),
                          jnp.logspace(-2.0, 4.0, n_points - 1)])
    y0 = jnp.asarray([[1.0], [0.0], [0.0]], jnp.float32)
    prior = Prior.uniform([-3.0, 5.5, 2.5, 1e-3],
                          [0.0, 8.5, 5.5, 0.1])
    dae = form == "dae"
    m = ODEModel(rhs=robertson_dae_rhs if dae else robertson_rhs,
                 param_names=("lk1", "lk2", "lk3", "sigma"),
                 prior=prior, obs=jnp.zeros((3, n_points)), ts=ts, y0=y0,
                 observe=_robertson_observe, method="bdf2",
                 substeps=substeps, err_tol=1e-3,
                 alg_mask=(False, False, True) if dae else None)
    if key is None:
        key = jax.random.key(20250206)
    return m.generate_data(ROBERTSON_TRUE + (0.0,), key, noise_std)
