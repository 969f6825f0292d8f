"""North-star scale config: N = 1e6 methanation posterior on ONE chip.

BASELINE.md's scale target is a 10^6-particle methanation posterior
(1000x the reference's default N=1000,
/root/reference/SMC_methanation/methanation_set_conditon.py:107-108).
This executes it for real on the one available chip:

- granularity="block": every device execution bounded to
  cfg.block_particles likelihood rows (a full 1e6-particle sweep would be
  a ~10-minute execution, far over the tunnel worker's ~100 s survivable
  ceiling, docs/PERF.md "Execution-duration limit").
- .smcd streaming checkpoints every step (bounded host memory;
  io/checkpoint.save_state_chunked).
- Library-level stall recovery (utils/resilient): in-process
  run_resilient reload-and-continue around per-step checkpoints, and the
  script supervises itself — parent = resilient.supervise restarting a
  --worker child on process-poisoning crashes (the recorded N=1e5 run ate
  a ~40 min TPU-worker stall; at 1e6 scale recovery is load-bearing).

Wall budget: the recorded 1e5 run sustained ~1530 weight-updates/s
mid-run (6214 s total, benchmarks/results/meth_1e5_r03.json); the same
per-particle cost puts a full 1e6 posterior at ~6-8 h. Progress (per-step
wall, gamma, rate) is streamed to METRICS so partial evidence exists at
any point; the final record lands in benchmarks/results/meth_1e6_r04.json.

Launch detached (never under a Bash timeout):

    setsid python benchmarks/run_methanation_1e6.py \
        > /tmp/meth_1e6.out 2>&1 < /dev/null &
"""
import json
import os
import sys
import time

N = int(os.environ.get("SMC_1E6_N", 1_000_000))
BLOCK = int(os.environ.get("SMC_1E6_BLOCK", 100_000))
CHUNK = int(os.environ.get("SMC_1E6_CHUNK", 512))
TAG = os.environ.get("SMC_1E6_TAG", "meth_1e6")
# Run state lives IN THE REPO (not /tmp): the round-4 first attempt lost
# 67 min of tempering progress to a VM restart because its .smcd lived in
# /tmp. A committed checkpoint lets the run span VM restarts AND rounds.
RUN_DIR = os.environ.get(
    "SMC_1E6_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)),
                 "results", "run_1e6"))
CKPT = os.path.join(RUN_DIR, f"{TAG}_ck.smcd")
WALL = os.path.join(RUN_DIR, f"{TAG}_wall.json")
METRICS = os.path.join(RUN_DIR, f"{TAG}_metrics.jsonl")
# Touching this file stops the run cleanly between device executions
# (driver stop_file; killing the process mid-execution wedges the chip).
STOP = os.path.join(RUN_DIR, "STOP")
OUT_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "results")


def worker() -> None:
    import jax
    if os.environ.get("SMC_1E6_CPU"):  # tiny-N script-logic smoke
        # (env JAX_PLATFORMS is too late: sitecustomize registers the
        # TPU plugin at interpreter start — flip the config post-import)
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from smc_tpu import SMCConfig
    from smc_tpu.models.methanation import (KIN_TRUE, MethanationModel,
                                            SIGMA_TRUE)
    from smc_tpu.utils.compile_cache import enable_persistent_cache
    from smc_tpu.utils.resilient import run_resilient

    enable_persistent_cache()
    # Linear solver is re-read at every worker (re)start from a control
    # file, so an improved engine can be deployed mid-run on the next
    # supervisor restart without touching the running process (the SMC
    # state is solver-agnostic: a checkpoint resumes under any engine).
    solver = "auto"
    try:
        solver = (open(os.path.join(RUN_DIR, "solver.txt")).read().strip()
                  or "auto")
    except OSError:
        pass
    os.makedirs(RUN_DIR, exist_ok=True)
    print(f"worker start: solver={solver}", flush=True)
    # nx/conditions overrides exist only for the CPU script-logic smoke;
    # the real run uses the reference's full nx=51 x 30-condition problem.
    model = MethanationModel.default(
        n_conditions=int(os.environ.get("SMC_1E6_COND", 30)),
        nx=int(os.environ.get("SMC_1E6_NX", 51)),
        particle_chunk=CHUNK, solver=solver)
    cfg = SMCConfig(n_particles=N, block_particles=BLOCK,
                    max_steps=int(os.environ.get("SMC_1E6_MAX_STEPS", 50)))

    prev_wall = 0.0
    if os.path.exists(WALL) and os.path.isdir(CKPT):
        prev_wall = json.load(open(WALL))["wall_s"]
    t0 = time.perf_counter()

    def cb(st):
        wall = prev_wall + time.perf_counter() - t0
        json.dump({"wall_s": wall}, open(WALL, "w"))
        with open(METRICS, "a") as fh:
            fh.write(json.dumps({
                "step": int(st.step), "gamma": float(st.gamma),
                "n_mh": int(st.n_mh), "ess": float(st.ess),
                "accepted": int(st.accepted),
                "max_log_lik": float(st.max_log_lik),
                "total_lik_evals": float(st.total_lik_evals),
                "wall_s": round(wall, 1)}) + "\n")

    st = run_resilient(model, cfg, jax.random.key(0), checkpoint=CKPT,
                       granularity="block", callback=cb, max_restarts=3,
                       retry_delay_s=120.0, verbose=True, stop_file=STOP)
    wall = prev_wall + time.perf_counter() - t0
    complete = float(st.gamma) >= 1.0
    p = np.asarray(st.particles)
    truth = np.asarray(list(KIN_TRUE) + [SIGMA_TRUE])[list(model.est_idx)]
    rec = {
        "n_particles": N, "n_conditions": model.cond.n_data,
        "nx": model.nx, "block": BLOCK,
        "chunk": CHUNK, "granularity": "block", "complete": complete,
        "gamma": float(st.gamma), "steps": int(st.step),
        "wall_s": round(wall, 1),
        "total_lik_evals": float(st.total_lik_evals),
        "weight_updates_per_s": round(float(st.total_lik_evals) / wall, 1),
        "dae_solves_per_s": round(30 * float(st.total_lik_evals) / wall, 1),
        "log_evidence": float(st.log_evidence),
        "params": list(model.param_names),
        "posterior_mean": [float(f"{v:.6g}") for v in p.mean(0)],
        "posterior_std": [float(f"{v:.6g}") for v in p.std(0)],
        "truth": truth.tolist(),
        "mean_within_1sd": bool(
            (np.abs(p.mean(0) - truth) < np.maximum(p.std(0), 1e-9)).all()),
    }
    base = ("meth_1e6_r05" if TAG == "meth_1e6" else TAG)
    out = os.path.join(OUT_DIR,
                       base + (".json" if complete else "_partial.json"))
    os.makedirs(OUT_DIR, exist_ok=True)
    json.dump(rec, open(out, "w"), indent=1)
    print(json.dumps(rec), flush=True)
    if complete:
        np.savez(os.path.join(RUN_DIR, "posterior.npz"), particles=p,
                 gamma=float(st.gamma))
        print("METH_1E6_DONE", flush=True)
    else:
        print("METH_1E6_STOPPED (resumable from checkpoint)", flush=True)


def main() -> None:
    if "--worker" in sys.argv:
        worker()
        return
    if os.path.exists(STOP):  # stale stop request from a prior session
        os.remove(STOP)
    from smc_tpu.utils.resilient import supervise
    rc = supervise([sys.executable, os.path.abspath(__file__), "--worker"],
                   progress_file=CKPT, max_restarts=5, retry_delay_s=120.0)
    print(f"supervisor exit: {rc}", flush=True)
    sys.exit(rc)


if __name__ == "__main__":
    main()
