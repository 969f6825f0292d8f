"""Harvest the 1e6 methanation run's current state into a result record.

Reads the run's latest .smcd checkpoint (written after every SMC step by
utils/resilient via benchmarks/run_methanation_1e6.py) plus the metrics
stream, and writes benchmarks/results/meth_1e6_r04{_partial}.json with
tempering progress, sustained rate, and posterior moments. Pure host-side
numpy — safe to run while the TPU worker is mid-execution (the memory-map
reads a completed checkpoint; fields are written atomically per step).

Run near round end if the full run hasn't finished; harmless no-op
improvement over the final record if it has.
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
WALL = os.path.join(RUN_DIR, f"{TAG}_wall.json")
METRICS = os.path.join(RUN_DIR, f"{TAG}_metrics.jsonl")
RESULTS = os.path.join(os.path.dirname(__file__), "results")


def main():
    meta = json.load(open(os.path.join(CKPT, "meta.json")))
    p = np.load(os.path.join(CKPT, "particles.npy"), mmap_mode="r")
    p = np.asarray(p)
    sc = meta["scalars"]
    gamma = float(np.asarray(sc["gamma"]))
    step = int(np.asarray(sc["step"]))
    evals = float(np.asarray(sc["total_lik_evals"]))
    wall = json.load(open(WALL))["wall_s"] if os.path.exists(WALL) else None
    lines = []
    if os.path.exists(METRICS):
        lines = [json.loads(x) for x in open(METRICS) if x.strip()]
    # KIN_TRUE/SIGMA_TRUE/est order pinned by models/methanation.py
    truth = [13.04, 52200.0, 114700.0, 96700.0, 5.0]
    done = gamma >= 1.0
    rec = {
        "n_particles": int(p.shape[0]),
        # Mirror run_methanation_1e6.py's model construction so an
        # override/smoke run is distinguishable from the real full grid.
        "n_conditions": int(os.environ.get("SMC_1E6_COND", 30)),
        "nx": int(os.environ.get("SMC_1E6_NX", 51)),
        "granularity": "block", "gamma": gamma, "steps": step,
        "complete": bool(done),
        "wall_s": None if wall is None else round(wall, 1),
        "total_lik_evals": evals,
        "weight_updates_per_s":
            None if not wall else round(evals / wall, 1),
        "dae_solves_per_s":
            None if not wall else round(30 * evals / wall, 1),
        "log_evidence": float(np.asarray(sc.get("log_evidence", 0.0))),
        "params": ["Af", "Eaf", "Ar", "Ear", "sigma"],
        "posterior_mean": [float(f"{v:.6g}") for v in p.mean(0)],
        "posterior_std": [float(f"{v:.6g}") for v in p.std(0)],
        "truth": truth,
        "per_step_metrics": lines,
    }
    os.makedirs(RESULTS, exist_ok=True)
    base = "meth_1e6_r05" if TAG == "meth_1e6" else TAG
    name = base + (".json" if done else "_partial.json")
    json.dump(rec, open(os.path.join(RESULTS, name), "w"), indent=1)
    print(json.dumps({k: rec[k] for k in
                      ("gamma", "steps", "complete", "wall_s",
                       "weight_updates_per_s", "posterior_mean")}))
    print("harvested ->", os.path.join(RESULTS, name))


if __name__ == "__main__":
    main()
