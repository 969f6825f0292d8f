"""Flagship log-evidence replicate scatter (round-3 verdict item 8).

SMC's tempering ladder yields the model evidence for free
(state.log_evidence = sum of per-step log-mean incremental weights); the
conjugate-Gaussian anchor and the MM model pin its correctness in
tests/test_evidence.py. This records the missing piece of the story: the
replicate spread of log Z on the FLAGSHIP methanation model at the
reference's default scale (N=1000, 30 conditions,
methanation_set_conditon.py:107), across >= 4 seeds on the real chip.
Result lands in benchmarks/results/evidence_scatter_r04.json and is
summarized in docs/PARITY.md.

Launch detached:
    setsid python benchmarks/evidence_scatter.py > /tmp/evscatter.out \
        2>&1 < /dev/null &
"""
import json
import os
import time

import jax

if os.environ.get("SMC_EV_CPU"):  # tiny smoke (conftest pattern)
    jax.config.update("jax_platforms", "cpu")

import numpy as np

from smc_tpu import SMCConfig, run_smc
from smc_tpu.models.methanation import MethanationModel
from smc_tpu.utils.compile_cache import enable_persistent_cache

N = int(os.environ.get("SMC_EV_N", 1000))
SEEDS = int(os.environ.get("SMC_EV_SEEDS", 6))
CHUNK = int(os.environ.get("SMC_EV_CHUNK", 512))
OUT = os.path.join(os.path.dirname(__file__), "results",
                   "evidence_scatter_r04.json")


def main():
    enable_persistent_cache()
    model = MethanationModel.default(n_conditions=30,
                                     particle_chunk=min(CHUNK, N))
    cfg = SMCConfig(n_particles=N)
    rows = []
    for seed in range(SEEDS):
        t0 = time.perf_counter()
        st = run_smc(model, cfg, jax.random.key(seed), verbose=False)
        wall = time.perf_counter() - t0
        p = np.asarray(st.particles)
        rows.append({
            "seed": seed, "gamma": float(st.gamma), "steps": int(st.step),
            "log_evidence": float(st.log_evidence),
            "wall_s": round(wall, 1),
            "posterior_mean": [float(f"{v:.6g}") for v in p.mean(0)],
        })
        print(json.dumps(rows[-1]), flush=True)
    lz = np.array([r["log_evidence"] for r in rows])
    rec = {"n_particles": N, "n_conditions": 30, "seeds": SEEDS,
           "log_evidence_mean": round(float(lz.mean()), 3),
           "log_evidence_std": round(float(lz.std(ddof=1)), 3),
           "log_evidence_values": [round(float(v), 3) for v in lz],
           "runs": rows}
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    json.dump(rec, open(OUT, "w"), indent=1)
    print(json.dumps({k: rec[k] for k in
                      ("log_evidence_mean", "log_evidence_std")}),
          flush=True)
    print("EVSCATTER_DONE", flush=True)


if __name__ == "__main__":
    main()
