"""SMC state checkpoint/resume.

The reference writes per-step particle CSVs but never reads them back
(SMC_methanation_main.py:422; SURVEY.md §5 'written but never read back for
resume'). Here checkpoints are complete: (particles, log_lik, gamma, PRNG
key, step, diagnostics) round-trip through one .npz so a run can resume
exactly — pass the loaded state to ``run_smc(..., state=...)``."""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from smc_tpu.smc.state import SMCState


def save_state(path: str, state: SMCState) -> None:
    flat = {f.name: np.asarray(getattr(state, f.name))
            for f in dataclasses.fields(state)
            if f.name != "key"}
    flat["key"] = np.asarray(jax.random.key_data(state.key))
    np.savez(path, **flat)


def load_state(path: str) -> SMCState:
    z = np.load(path if str(path).endswith(".npz") else path + ".npz")
    kw = {k: jnp.asarray(z[k]) for k in z.files if k != "key"}
    kw["key"] = jax.random.wrap_key_data(jnp.asarray(z["key"]))
    return SMCState(**kw)
