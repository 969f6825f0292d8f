"""High-level run orchestration: SMC + artifacts.

This is the L5 layer of the reference (the three ~90%-duplicated entry
scripts, SMC_methanation_main.py / Micmem_SMC_main.py / SMC_methanation.py)
expressed once: run a model to gamma=1 while writing the reference's full
artifact set — per-step particle CSVs and histogram-progress plots, parity
plots, checkpoints, posterior CSV + pairplot + prior/posterior comparison,
and the per-step console metric line (C20-C26)."""
from __future__ import annotations

import time
from typing import Optional, Sequence

import jax
import numpy as np

from smc_tpu.config import SMCConfig
from smc_tpu.io.checkpoint import save_state, load_state
from smc_tpu.io.csvio import save_particles_csv, save_posterior_csv
from smc_tpu.io.rundir import RunDir
from smc_tpu.smc.driver import init_state, run_smc
from smc_tpu.viz import plots


class RunManager:
    """Callback bundle writing the reference's artifact tree per SMC step."""

    def __init__(self, rundir: RunDir, model, cfg: SMCConfig,
                 true_values: Optional[Sequence[float]] = None,
                 plots_enabled: bool = True,
                 checkpoint_every: int = 1,
                 parity_every: int = 1,
                 parity_subsample: int = 64,
                 async_io: bool = True,
                 checkpoint_format: str = "auto"):
        self.rd = rundir
        self.model = model
        self.cfg = cfg
        self.true_values = true_values
        self.plots_enabled = plots_enabled
        self.checkpoint_every = max(1, checkpoint_every)
        # Per-step parity plots (the reference draws them DURING the run,
        # SMC_methanation_main.py:421 -> ParityplotDrawerWhileSMC); predicted
        # outputs come from one small extra likelihood eval on a particle
        # subsample (the reference replots from its cached full sweep).
        self.parity_every = max(1, parity_every)
        self.parity_subsample = parity_subsample
        self._pred_fn = None
        self.prior_particles = None
        # "auto": native async .smck if available else .npz; "npz"/"smck"
        # force those; "smcd" streams row slabs to a memory-mapped per-field
        # directory — O(slab) host memory for beyond-host-RAM states
        # (io/checkpoint.save_state_chunked).
        if checkpoint_format not in ("auto", "npz", "smck", "smcd"):
            raise ValueError(f"unknown checkpoint_format {checkpoint_format!r}")
        self.checkpoint_format = checkpoint_format
        self._ckpt = None
        if async_io and checkpoint_format in ("auto", "smck"):
            from smc_tpu.runtime import AsyncCheckpointer
            ck = AsyncCheckpointer()
            self._ckpt = ck if ck.is_native else None
        from smc_tpu.utils.metrics import MetricsLogger
        self.metrics = MetricsLogger(rundir.file("metrics.jsonl"))

    def _save_ckpt(self, state, name: str):
        from smc_tpu.io.checkpoint import (save_state, save_state_async,
                                           save_state_chunked)
        if self.checkpoint_format == "smcd":
            save_state_chunked(self.rd.file("checkpoints", name + ".smcd"),
                               state)
        elif self._ckpt is not None:
            save_state_async(self._ckpt,
                             self.rd.file("checkpoints", name + ".smck"),
                             state)
        else:
            save_state(self.rd.file("checkpoints", name + ".npz"), state)

    def on_init(self, state):
        self.prior_particles = np.asarray(state.particles)
        save_particles_csv(self.rd.file("pred", "first_p_pred.csv"),
                           state.particles)
        if self.plots_enabled:
            plots.plot_marginal_histograms(
                state.particles,
                self.rd.file("hist_progress", "00_PriorDistribution.png"),
                self.model.param_names, self.true_values)

    def _parity_plots(self, state, tag: str) -> None:
        obs = getattr(self.model, "obs", None)
        if obs is None:
            return
        p = np.asarray(state.particles)
        n_plot = min(self.parity_subsample, p.shape[0])
        if self._pred_fn is None:
            pred_model = self.model
            # Pallas likelihood variants return ll only; predictions for the
            # parity plots come from the equivalent jnp path.
            if getattr(pred_model, "method", "").startswith("pallas"):
                import dataclasses
                pred_model = dataclasses.replace(pred_model, method="exact")
            self._pred_fn = jax.jit(
                lambda th: pred_model.log_likelihood(th)[1])
        preds = self._pred_fn(jax.numpy.asarray(p[:n_plot]))
        if preds is not None:
            plots.plot_parity(obs, np.asarray(preds),
                              self.rd.file("parity_box", f"{tag}.png"),
                              self.rd.file("parity_mean", f"{tag}.png"))

    def __call__(self, state):
        step = int(state.step)
        self.metrics(state)
        save_particles_csv(self.rd.file("pred", f"{step}_p_pred.csv"),
                           state.particles)
        if step % self.checkpoint_every == 0:
            self._save_ckpt(state, f"step{step}")
        if self.plots_enabled:
            plots.plot_marginal_histograms(
                state.particles,
                self.rd.file("hist_progress",
                             f"step{step:02d}_nMH{int(state.n_mh)}.png"),
                self.model.param_names, self.true_values)
            if step % self.parity_every == 0:
                self._parity_plots(state, f"step{step:02d}")

    def finalize(self, state):
        p = np.asarray(state.particles)
        save_posterior_csv(self.rd.file("Posterior_Distribution.csv"), p,
                           self.model.param_names)
        save_particles_csv(self.rd.file("pred", "last_p_pred.csv"), p)
        if self.checkpoint_format == "smcd":
            self._save_ckpt(state, "final")
        else:
            save_state(self.rd.file("checkpoints", "final.npz"), state)
        self.metrics.close()
        if self._ckpt is not None:
            self._ckpt.close()
        if self.plots_enabled:
            plots.plot_marginal_histograms(
                p, self.rd.file("SMC_Posterior_Distribution.png"),
                self.model.param_names, self.true_values)
            plots.plot_pairplot(p, self.rd.file("Posterior_Pairplot.png"),
                                self.model.param_names)
            if self.prior_particles is not None:
                plots.plot_prior_posterior_compare(
                    self.prior_particles, p,
                    self.rd.file("Histgram_compare.png"),
                    self.model.param_names, self.true_values)
            self._parity_plots(state, "parity")


def run_with_artifacts(model, cfg: SMCConfig, key,
                       rundir: Optional[RunDir] = None,
                       true_values: Optional[Sequence[float]] = None,
                       resume_from: Optional[str] = None,
                       plots_enabled: bool = True,
                       verbose: bool = True,
                       mesh=None,
                       granularity: str = "step",
                       checkpoint_format: str = "auto",
                       max_restarts: int = 0,
                       stop_file: Optional[str] = None):
    """Full orchestrated run; returns (final_state, rundir).

    ``mesh``: optional jax.sharding.Mesh — the particle axis is sharded over
    it, including on resume (a loaded checkpoint is re-sharded before the
    run continues).

    ``granularity``: forwarded to :func:`run_smc` — "sweep" bounds each
    device execution to one mutation sweep (huge-N tunnel survival).

    ``max_restarts`` > 0 makes the run stall/crash-resilient
    (utils/resilient.run_resilient): every step is checkpointed to
    ``checkpoints/latest`` and, on a device/runtime failure, the run
    reloads it and continues — up to ``max_restarts`` consecutive
    failures without step progress (replaces the reference's Ray memory
    watchdog, methanation_functions.py:73-78).

    ``stop_file``: optional path polled between device executions
    (driver ``stop_file``); touching it makes the run finalize cleanly
    with the last completed step's state — the safe way to preempt a
    long detached run (artifacts, posterior CSVs, and the checkpoint are
    still written, so the run can later be resumed with ``resume_from``).

    On a multi-host pod only the primary host (jax.process_index()==0) owns
    artifact IO: non-primary processes run the same SPMD compute but create
    no run dir, write no files, and return rundir=None."""
    from smc_tpu.parallel.multihost import is_primary_host
    primary = is_primary_host()
    rd = (rundir or RunDir(tag=type(model).__name__)) if primary else None
    mgr = None
    if primary:
        rd.archive_config(cfg, model)
        mgr = RunManager(rd, model, cfg, true_values, plots_enabled,
                         checkpoint_format=checkpoint_format)

    psharding = None
    if mesh is not None:
        from smc_tpu.parallel.mesh import particle_sharding, shard_state
        psharding = particle_sharding(mesh)

    # C25 error capture: the reference wraps the whole run in try/except and
    # prints the traceback (SMC_methanation_main.py:440-449); here the
    # traceback is also persisted next to the run artifacts.
    t0 = time.perf_counter()
    try:
        if resume_from:
            # sharding= puts each device's row slab straight onto its
            # shard from the checkpoint mmap — no O(N) host staging
            state = load_state(resume_from, sharding=psharding)
        else:
            state = init_state(key, model, cfg)
        if mesh is not None:
            state = shard_state(state, mesh)
        if mgr is not None:
            mgr.on_init(state)
        if max_restarts > 0:
            import os
            import tempfile
            from smc_tpu.utils.resilient import run_resilient
            ext = ".smcd" if checkpoint_format == "smcd" else ".npz"
            ckpt = (rd.file("checkpoints", "latest" + ext) if rd is not None
                    else os.path.join(tempfile.gettempdir(),
                                      f"smc_latest_{os.getpid()}" + ext))
            state = run_resilient(
                model, cfg, key, checkpoint=ckpt, callback=mgr, state=state,
                max_restarts=max_restarts, verbose=verbose and primary,
                psharding=psharding, granularity=granularity, resume=False,
                stop_file=stop_file)
        else:
            state = run_smc(model, cfg, key, callback=mgr, state=state,
                            verbose=verbose and primary, psharding=psharding,
                            granularity=granularity, stop_file=stop_file)
        if verbose and primary:
            print(f"end_time:{time.perf_counter() - t0}")
        if mgr is not None:
            mgr.finalize(state)
    except BaseException:
        import traceback
        if rd is not None:
            with open(rd.file("error.log"), "a") as f:
                f.write(traceback.format_exc())
        raise
    return state, rd
