"""SMC state checkpoint/resume.

The reference writes per-step particle CSVs but never reads them back
(SMC_methanation_main.py:422; SURVEY.md §5 'written but never read back for
resume'). Here checkpoints are complete: (particles, log_lik, gamma, PRNG
key, step, diagnostics) round-trip through one .npz so a run can resume
exactly — pass the loaded state to ``run_smc(..., state=...)``.

Scale limit: ``save_state`` gathers the full particle array to host
memory (``np.asarray`` per field), so checkpoint size and host RSS are
O(N x d) — ~32 MB at N=1e6, ~3.2 GB at 1e8. Fine for every configuration
run to date (the 1e8-particle mesh ambition the ring resampler targets
would need per-shard writes via ``jax.experimental.multihost_utils`` or
orbax-style OCDBT — not implemented; revisit when a pod is available)."""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from smc_tpu.smc.state import SMCState


def _flatten(state: SMCState) -> dict:
    flat = {f.name: np.asarray(getattr(state, f.name))
            for f in dataclasses.fields(state)
            if f.name != "key"}
    flat["key"] = np.asarray(jax.random.key_data(state.key))
    return flat


def _unflatten(d: dict) -> SMCState:
    kw = {k: jnp.asarray(np.asarray(v)) for k, v in d.items() if k != "key"}
    kw["key"] = jax.random.wrap_key_data(jnp.asarray(np.asarray(d["key"])))
    # Fields added after a checkpoint was written load with their neutral
    # value (forward compatibility for pre-evidence .npz/.smck snapshots).
    kw.setdefault("log_evidence", jnp.zeros((), jnp.float32))
    return SMCState(**kw)


def save_state(path: str, state: SMCState) -> None:
    """Synchronous .npz checkpoint."""
    np.savez(path, **_flatten(state))


def save_state_async(checkpointer, path: str, state: SMCState) -> None:
    """Queue a checkpoint on the native async writer (.smck container;
    smc_tpu/runtime). The driver thread pays only a host copy."""
    checkpointer.submit(path, _flatten(state))


def load_state(path: str) -> SMCState:
    path = str(path)
    if path.endswith(".smck"):
        from smc_tpu.runtime import load_snapshot
        return _unflatten(load_snapshot(path))
    z = np.load(path if path.endswith(".npz") else path + ".npz")
    return _unflatten({k: z[k] for k in z.files})
