"""Accuracy probe: steady-state SER-PTC solve vs transient march endpoints.

Questions:
1. Is the reactor at steady state by t_final=75?  (march to t=150 at the
   same density should land on the same endpoint)
2. How far is the 48-step default march from the dense 96-step reference?
   (known ~2.2 sccm discretization error over posterior-bulk draws,
   docs/PERF.md)
3. How far is the SER-PTC steady solve from both, and what fraction of
   lanes fail its convergence certificate?

Draws are posterior-relevant: the truth plus samples from the reference's
uniform prior box over the estimated parameters (est_idx scattered onto
the true base vector) — the same population a likelihood sweep sees.

Run on the TPU chip (detached, one process):
    setsid python benchmarks/probe_steady.py > /tmp/probe_steady.out 2>&1 &
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from smc_tpu.models.methanation import (EST_DEFAULT, KIN_TRUE,
                                        MethanationModel, methanation_prior)

BASE = MethanationModel.default(n_conditions=30, particle_chunk=8)

prior = methanation_prior(EST_DEFAULT)
theta = np.asarray(prior.sample(jax.random.key(7), 7))     # (7, 5)
kins = [np.asarray(KIN_TRUE, np.float32)]
for t in theta:
    kin = np.asarray(KIN_TRUE, np.float64).copy()
    for j, idx in enumerate(EST_DEFAULT):
        if idx < 8:                     # last est param is sigma, not kinetic
            kin[idx] = t[j]
    kins.append(kin.astype(np.float32))
KINS = jnp.asarray(np.stack(kins), jnp.float32)            # (8, 8)

CONFIGS = {
    "dense96":  dict(n_steps=96, newton_iters=3, jac_stride=1, dense_tail=0,
                     growth=1.14),
    "dense96_t150": dict(n_steps=96, newton_iters=3, jac_stride=1,
                         dense_tail=0, growth=1.14, t_final=150.0),
    "march48":  dict(),                                    # round-2 default
    "steady20": dict(march="steady"),
    "steady17": dict(march="steady", ptc_steps=17),
    "steady24": dict(march="steady", ptc_steps=24),
}


def flows_for(cfg):
    model = dataclasses.replace(BASE, **cfg)
    fn = jax.jit(lambda k: model._flows_batch_bl(k))
    return np.asarray(fn(KINS))                            # (8, 5, 30)


out = {}
for name, cfg in CONFIGS.items():
    out[name] = flows_for(cfg)
    nfail = int((out[name][:, 0, :] == -10000.0).sum())
    print(f"{name}: done, failed condition-solves = {nfail}/240", flush=True)

ref = out["dense96"]


def report(name):
    v = out[name]
    mask = (v != -10000.0) & (ref != -10000.0)
    d = np.abs(v - ref)
    per_draw = [d[i][mask[i]].max() if mask[i].any() else np.nan
                for i in range(v.shape[0])]
    overall = d[mask].max() if mask.any() else np.nan
    print(f"{name:14s} vs dense96: max|dF| = {overall:9.4f} sccm, "
          f"mean = {d[mask].mean() if mask.any() else np.nan:8.5f}, "
          f"masked entries = {int((~mask).sum())}")
    print(f"               per-draw max: "
          f"{np.array2string(np.asarray(per_draw), precision=3)}")


for name in CONFIGS:
    if name != "dense96":
        report(name)
print("PROBE_DONE", flush=True)
