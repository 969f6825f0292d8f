"""A/B: RWM vs MALA mutation ON THE FLAGSHIP methanation posterior.

Run on the real chip (detached):  python benchmarks/ab_mala_methanation.py

This is the payoff run for the differentiable flagship (round-2 work: the
steady-state DAE solve with the IFT adjoint): SMC with ``mutation="mala"``
+ ``march="steady"`` against the reference-parity configuration
``mutation="rwm"`` + ``march="transient"``, interleaved same-process,
matched seeds, on the reference's default problem shape (30 synthetic
conditions, 5 estimated parameters incl. sigma).

Cost accounting: a MALA likelihood eval pays one extra VJP through the
steady solve (~1 adjoint linear solve ~ 1 extra residual+backsolve sweep,
so ~2x a plain eval is the conservative weight); the steady march itself
measured 13% slower than the lagged transient march (docs/PERF.md). MALA
must therefore beat RWM by >2x on evals-to-gamma=1 to win wall clock.

Reference black-box worker this surpasses (or doesn't — measured either
way): SMC_methanation/methanation_functions.py:44-65.
"""
import dataclasses
import json
import time

import jax
import numpy as np

from smc_tpu import SMCConfig, run_smc
from smc_tpu.models.methanation import KIN_TRUE, MethanationModel, SIGMA_TRUE


def run_one(model, mutation, n, seed):
    cfg = SMCConfig(n_particles=n, mutation=mutation)
    t0 = time.perf_counter()
    st = run_smc(model, cfg, jax.random.key(seed), verbose=False)
    wall = time.perf_counter() - t0
    p = np.asarray(st.particles)
    return dict(gamma=float(st.gamma), evals=float(st.total_lik_evals),
                steps=int(st.step), wall_s=round(wall, 2),
                mean=p.mean(0).tolist(), std=p.std(0).tolist())


def main(n=512, seeds=(0, 1)):
    base = MethanationModel.default(n_conditions=30, particle_chunk=128)
    steady = dataclasses.replace(base, march="steady")
    truth = np.asarray([list(KIN_TRUE) + [SIGMA_TRUE]][0])[list(base.est_idx)]
    lo = np.asarray(base.prior.low, float)
    hi = np.asarray(base.prior.high, float)

    results = {"rwm": [], "mala": []}
    # interleaved: rwm seed0, mala seed0, rwm seed1, mala seed1 — session
    # drift hits both arms equally
    for seed in seeds:
        for mut, model in (("rwm", base), ("mala", steady)):
            r = run_one(model, mut, n, seed)
            # prior-normalized posterior mean error (comparable across
            # params with wildly different scales)
            err = np.abs((np.asarray(r["mean"]) - truth) / (hi - lo))
            r["norm_mean_err"] = float(err.mean())
            results[mut].append(r)
            print(json.dumps({"arm": mut, "seed": seed, **r}), flush=True)

    for mut in ("rwm", "mala"):
        rs = results[mut]
        evals = np.mean([r["evals"] for r in rs])
        cost = evals * (2.0 if mut == "mala" else 1.0)
        print(json.dumps({
            "summary": mut, "n": n,
            "mean_evals_to_gamma1": evals,
            "vjp_weighted_cost": cost,
            "mean_norm_err": float(np.mean([r["norm_mean_err"]
                                            for r in rs])),
            "mean_wall_s": float(np.mean([r["wall_s"] for r in rs])),
            "all_converged": all(r["gamma"] == 1.0 for r in rs)}),
            flush=True)


if __name__ == "__main__":
    main()
