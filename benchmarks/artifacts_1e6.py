"""Posterior artifact set for the 1e6-particle methanation run (C20-C23
at 1000x the reference's scale, ref
SMC_methanation/methanation_functions.py:185-234).

Pure host-side: memory-maps the run's latest .smcd checkpoint (safe while
the TPU worker is marching) and writes

- run_1e6/posterior_sample.csv   10k-row reproducible subsample (the full
                                 1e6-particle cloud stays in posterior.npz
                                 / the checkpoint; a 50 MB CSV serves
                                 nobody) with a header row, reference CSV
                                 style (Posterior_Distribution.csv)
- run_1e6/marginals.png          marginal histograms over ALL 1e6
                                 particles, truth vlines
- run_1e6/pairplot.png           corner pairplot on a 5k subsample
- results/meth_1e6_compare.json  moment table vs the recorded N=1e5/1e4
                                 runs (docs/PARITY.md flagship table) with
                                 per-parameter mean shifts in posterior-sd
                                 units — the BASELINE.md scale-target row

Run any time: partial artifacts are labeled with the checkpoint's gamma.
"""
import json
import os

import numpy as np

TAG = os.environ.get("SMC_1E6_TAG", "meth_1e6")
RUN_DIR = os.environ.get(
    "SMC_1E6_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)),
                 "results", "run_1e6"))
CKPT = os.path.join(RUN_DIR, f"{TAG}_ck.smcd")
RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "results")
# KIN_TRUE + SIGMA_TRUE at EST_DEFAULT order, models/methanation.py
PARAMS = ["Af", "Eaf", "Ar", "Ear", "sigma"]
TRUTH = np.array([13.04, 52200.0, 114700.0, 96700.0, 5.0])


def main():
    meta = json.load(open(os.path.join(CKPT, "meta.json")))
    gamma = float(np.asarray(meta["scalars"]["gamma"]))
    step = int(np.asarray(meta["scalars"]["step"]))
    p = np.load(os.path.join(CKPT, "particles.npy"), mmap_mode="r")
    n = p.shape[0]
    tag = "" if gamma >= 1.0 else f" (PARTIAL gamma={gamma:.3g})"
    print(f"artifacts from step {step}, gamma {gamma:.6g}, N={n}{tag}")

    rng = np.random.default_rng(0)
    sub = np.asarray(p[np.sort(rng.choice(n, min(10_000, n),
                                          replace=False))])
    csv = os.path.join(RUN_DIR, "posterior_sample.csv")
    np.savetxt(csv, sub, delimiter=",", header=",".join(PARAMS),
               comments="", fmt="%.8g")
    print("wrote", csv)

    from smc_tpu.viz.plots import plot_marginal_histograms, plot_pairplot
    full = np.asarray(p)
    ok1 = plot_marginal_histograms(
        full, os.path.join(RUN_DIR, "marginals.png"), PARAMS,
        true_values=TRUTH, bins=80)
    ok2 = plot_pairplot(sub[:5000], os.path.join(RUN_DIR, "pairplot.png"),
                        PARAMS)
    print(f"marginals.png: {ok1}  pairplot.png: {ok2}")

    mean, std = full.mean(0), full.std(0)
    rows = {"n=1e6 this run" + tag:
            {"mean": mean.tolist(), "std": std.tolist()}}
    comp = {}
    for name, path in [("1e5", "meth_1e5_r03.json"),
                       ("1e4", "meth_1e4_r02.json")]:
        fp = os.path.join(RESULTS, path)
        if not os.path.exists(fp):
            continue
        r = json.load(open(fp))
        m5 = np.array(r["posterior_mean"])
        s5 = np.array(r["posterior_std"])
        rows[f"n={name} recorded"] = {"mean": m5.tolist(),
                                      "std": s5.tolist()}
        comp[f"vs_{name}"] = {
            # mean shift in units of the LARGER run's posterior sd —
            # the scale-invariant agreement number (ridge params have
            # O(1e6) absolute scales)
            "mean_shift_in_sd": [round(float(v), 3) for v in
                                 np.abs(mean - m5) / np.maximum(std, 1e-12)],
            "mean_rel_diff_pct": [round(float(v), 2) for v in
                                  100 * np.abs(mean - m5) /
                                  np.maximum(np.abs(m5), 1e-12)],
            "std_ratio": [round(float(v), 3) for v in
                          std / np.maximum(s5, 1e-12)],
        }
    rec = {"gamma": gamma, "steps": step, "n_particles": int(n),
           "params": PARAMS, "truth": TRUTH.tolist(),
           "complete": gamma >= 1.0, "moments": rows,
           "agreement": comp,
           "sigma_within_10pct_of_truth":
               bool(abs(mean[-1] - 5.0) / 5.0 < 0.10)}
    out = os.path.join(RESULTS, "meth_1e6_compare.json")
    json.dump(rec, open(out, "w"), indent=1)
    print(json.dumps({k: rec[k] for k in
                      ("gamma", "complete", "agreement",
                       "sigma_within_10pct_of_truth")}))
    print("wrote", out)


if __name__ == "__main__":
    main()
