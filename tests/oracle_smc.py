"""Sequential NumPy implementation of the reference's SMC algorithm.

An independent host-side re-implementation of the published algorithm
(SMC_Algorithm/algorithm1.png + algorithm2.png; driver loop
Micmem_SMC_main.py:105-271) used ONLY as a statistical oracle in tests:
posterior moments from smc_tpu must match this implementation within Monte
Carlo tolerance at equal particle counts (BASELINE.md target). Plain Python
loops, NumPy RNG — deliberately nothing shared with the TPU implementation.
"""
from __future__ import annotations

import numpy as np
from scipy.special import lambertw as scipy_lambertw


def mm_loglik_np(theta, obs, s0, ts):
    """Closed-form MM likelihood (same math as the TPU 'exact' method but
    via scipy's Lambert W)."""
    Vmax, Km, sigma = theta
    if sigma <= 0:
        return -np.inf
    Km = max(Km, 1e-8)
    logz = np.log(s0 / Km)[None, :] + (s0[None, :] - Vmax * ts[:, None]) / Km
    z = np.exp(np.clip(logz, -60, 60))
    S = Km * scipy_lambertw(z).real          # (T, n_ds)
    P_model = (s0[None, :] - S).T            # (n_ds, T)
    r = obs - P_model
    n = obs.shape[1]
    ll = (-0.5 * n * np.log(2 * np.pi * sigma ** 2)
          - (r ** 2).sum(axis=1) / (2 * sigma ** 2)).sum()
    return ll if np.isfinite(ll) else -np.inf


def run_reference_smc(obs=None, s0=None, ts=None, n_particle=256, seed=0,
                      prior_low=(0, 0, 0), prior_high=(10, 10, 10),
                      ess_limit=0.5, d_gamma_max=1.0, gm_rate=0.7,
                      gm_iters=80, mh_num=5, mh_num_final=20,
                      r_th=0.5, r_th_f=0.7, r_th_min=0.1,
                      w_cov_diag=0.5, w_cov_off=0.5, itr_max=50,
                      loglik_fn=None):
    """The reference driver loop, faithfully sequential.

    ``loglik_fn(p) -> (N,)`` may supply any batched log-likelihood (used for
    the methanation parity test, where both implementations share the same
    forward model and only the SMC machinery differs); the default is the
    scipy Lambert-W Michaelis-Menten likelihood on (obs, s0, ts).
    """
    rng = np.random.RandomState(seed)
    lo, hi = np.asarray(prior_low, float), np.asarray(prior_high, float)
    d = len(lo)
    inv_np = 1.0 / n_particle

    if loglik_fn is None:
        def loglik_all(p):
            return np.array([mm_loglik_np(p[i], obs, s0, ts)
                             for i in range(n_particle)])
    else:
        loglik_all = loglik_fn

    w_cov = np.full((d, d), w_cov_off)
    np.fill_diagonal(w_cov, w_cov_diag)

    p_pred = lo + rng.uniform(size=(n_particle, d)) * (hi - lo)
    lk = loglik_all(p_pred)
    gamma_old = 0.0
    log_z = 0.0      # running evidence: sum_k log mean_i exp(dgamma*ll_i)

    for _ in range(1, itr_max):
        gamma_new = min(gamma_old + d_gamma_max, 1.0)
        d_lk = lk - lk.max()
        for _ in range(gm_iters):
            gm = gamma_new - gamma_old
            p_weight = np.exp(d_lk * gm)
            p_weight = p_weight / p_weight.sum()
            ess = 1.0 / ((p_weight ** 2).sum() * n_particle)
            if ess > ess_limit:
                break
            gamma_new = (gamma_new - gamma_old) * gm_rate + gamma_old
        log_z += (gamma_new - gamma_old) * lk.max() + np.log(
            np.exp(d_lk * (gamma_new - gamma_old)).mean())

        # residual-systematic resampling (Algorithm 2, sequential)
        p_is = np.trunc(p_weight * n_particle).astype(int)
        resid = p_weight - p_is * inv_np
        wrand = rng.rand() * inv_np
        p_filt = np.empty_like(p_pred)
        lk1 = np.empty_like(lk)
        s = 0.0
        n = 0
        for j in range(n_particle):
            s += resid[j]
            if s >= wrand:
                p_is[j] += 1
                wrand += inv_np
            for _k in range(p_is[j]):
                p_filt[n] = p_pred[j]
                lk1[n] = lk[j]
                n += 1

        # adaptive RW-MH mutation
        r_ac = np.zeros(n_particle)
        ratio = 1.0
        if gamma_new >= 1.0:
            nMH, rth = mh_num_final, r_th_f
        else:
            nMH, rth = mh_num, r_th
        for _j in range(nMH):
            cov_m = np.cov(p_filt.T, bias=True) * w_cov
            prop = p_filt + rng.multivariate_normal(
                np.zeros(d), cov_m, n_particle) * ratio
            in_sup = np.all((prop >= lo) & (prop <= hi), axis=1)
            prop = np.where(in_sup[:, None], prop, p_filt)
            lk2 = loglik_all(prop)
            pp = np.exp((lk2 - lk1) * gamma_new) * in_sup
            rr = rng.uniform(0, 1, n_particle)
            acc = pp >= rr
            p_filt = np.where(acc[:, None], prop, p_filt)
            lk1 = np.where(acc, lk2, lk1)
            r_ac = np.maximum(r_ac, acc)
            if r_ac.sum() > rth * n_particle:
                break
            if r_ac.sum() < r_th_min * n_particle:
                ratio *= 0.5

        p_pred = p_filt.copy()
        lk = lk1.copy()
        if gamma_new == 1.0:
            break
        gamma_old = gamma_new

    return p_pred, gamma_new, log_z
