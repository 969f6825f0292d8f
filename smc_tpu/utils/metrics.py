"""Observability: per-step metrics stream + profiler integration.

The reference's observability is print statements and plots (SURVEY.md §5:
the canonical console line at SMC_methanation_main.py:410, wall time via
time.time(), memory_profiler imported but disabled). Here:

- ``MetricsLogger``: one JSON line per SMC step (every SMCState diagnostic +
  wall clock) appended to metrics.jsonl — machine-readable run history the
  reference never persisted.
- ``profile_trace``: context manager around jax.profiler.trace for
  TensorBoard-compatible device traces (the tracer the reference lacks).
"""
from __future__ import annotations

import contextlib
import json
import time
from typing import IO, Optional


class MetricsLogger:
    """Append-only JSONL metrics stream, usable as a run_smc callback."""

    FIELDS = ("step", "gamma", "ess", "max_log_lik", "n_mh", "accepted",
              "n_gamma_reductions", "mh_ratio", "total_lik_evals",
              "log_evidence")

    def __init__(self, path: str):
        self.path = path
        self._t0 = time.perf_counter()
        self._f: Optional[IO] = open(path, "a")

    def __call__(self, state) -> None:
        rec = {k: float(getattr(state, k)) for k in self.FIELDS}
        rec["step"] = int(rec["step"])
        rec["n_mh"] = int(rec["n_mh"])
        rec["accepted"] = int(rec["accepted"])
        rec["n_gamma_reductions"] = int(rec["n_gamma_reductions"])
        rec["wall_time_s"] = round(time.perf_counter() - self._t0, 4)
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()

    def close(self) -> None:
        if self._f is not None:
            self._f.close()
            self._f = None


@contextlib.contextmanager
def profile_trace(logdir: Optional[str]):
    """jax.profiler.trace wrapper; no-op when logdir is falsy or the
    profiler is unavailable in this environment."""
    if not logdir:
        yield
        return
    import jax
    try:
        with jax.profiler.trace(logdir):
            yield
    except Exception:
        yield


def read_metrics(path: str):
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]
