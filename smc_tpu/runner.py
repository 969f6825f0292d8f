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
                 async_io: bool = True):
        self.rd = rundir
        self.model = model
        self.cfg = cfg
        self.true_values = true_values
        self.plots_enabled = plots_enabled
        self.checkpoint_every = max(1, checkpoint_every)
        self.prior_particles = None
        self._ckpt = None
        if async_io:
            from smc_tpu.runtime import AsyncCheckpointer
            ck = AsyncCheckpointer()
            self._ckpt = ck if ck.is_native else None
        from smc_tpu.utils.metrics import MetricsLogger
        self.metrics = MetricsLogger(rundir.file("metrics.jsonl"))

    def _save_ckpt(self, state, name: str):
        from smc_tpu.io.checkpoint import save_state, save_state_async
        if self._ckpt is not None:
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

    def finalize(self, state):
        p = np.asarray(state.particles)
        save_posterior_csv(self.rd.file("Posterior_Distribution.csv"), p,
                           self.model.param_names)
        save_particles_csv(self.rd.file("pred", "last_p_pred.csv"), p)
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
            obs = getattr(self.model, "obs", None)
            if obs is not None:
                n_plot = min(64, p.shape[0])
                _, preds = self.model.log_likelihood(
                    jax.numpy.asarray(p[:n_plot]))
                if preds is not None:
                    plots.plot_parity(
                        obs, np.asarray(preds),
                        self.rd.file("parity_box", "parity.png"),
                        self.rd.file("parity_mean", "parity.png"))


def run_with_artifacts(model, cfg: SMCConfig, key,
                       rundir: Optional[RunDir] = None,
                       true_values: Optional[Sequence[float]] = None,
                       resume_from: Optional[str] = None,
                       plots_enabled: bool = True,
                       verbose: bool = True):
    """Full orchestrated run; returns (final_state, rundir)."""
    rd = rundir or RunDir(tag=type(model).__name__)
    rd.archive_config(cfg, model)
    mgr = RunManager(rd, model, cfg, true_values, plots_enabled)

    # C25 error capture: the reference wraps the whole run in try/except and
    # prints the traceback (SMC_methanation_main.py:440-449); here the
    # traceback is also persisted next to the run artifacts.
    t0 = time.perf_counter()
    try:
        if resume_from:
            state = load_state(resume_from)
        else:
            state = init_state(key, model, cfg)
        mgr.on_init(state)
        state = run_smc(model, cfg, key, callback=mgr, state=state,
                        verbose=verbose)
        if verbose:
            print(f"end_time:{time.perf_counter() - t0}")
        mgr.finalize(state)
    except BaseException:
        import traceback
        with open(rd.file("error.log"), "a") as f:
            f.write(traceback.format_exc())
        raise
    return state, rd
