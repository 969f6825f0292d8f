"""SMC state checkpoint/resume.

The reference writes per-step particle CSVs but never reads them back
(SMC_methanation_main.py:422; SURVEY.md §5 'written but never read back for
resume'). Here checkpoints are complete: (particles, log_lik, gamma, PRNG
key, step, diagnostics) round-trip through one .npz so a run can resume
exactly — pass the loaded state to ``run_smc(..., state=...)``.

Scale limit of the .npz/.smck paths: ``save_state`` gathers the full
particle array to host memory (``np.asarray`` per field), so checkpoint
size and host RSS are O(N x d) — ~32 MB at N=1e6, ~3.2 GB at 1e8. Fine
for every configuration run to date. Past that, ``save_state_chunked``
writes a ``.smcd`` directory instead: every particle-axis field is
streamed to a memory-mapped ``.npy`` in row slabs pulled from the device
one at a time (per addressable shard on a mesh, sliced further to the
byte budget), so peak host memory is O(slab), not O(N). ``load_state``
reads all three formats."""
from __future__ import annotations

import dataclasses
import json
import os

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


def _iter_row_slabs(arr, max_bytes: int):
    """Yield ``(global_row_offset, host_slab)`` covering ``arr``'s rows.

    Pulls at most ``max_bytes`` of data to host per yield. Sharded arrays
    are walked one addressable shard at a time (each shard's device buffer
    is sliced on host — no cross-device gather is ever materialized);
    single-device arrays are sliced on device so the transfer itself is
    slab-sized."""
    row_bytes = max(1, int(np.prod(arr.shape[1:])) * arr.dtype.itemsize)
    slab_rows = max(1, max_bytes // row_bytes)
    shards = getattr(arr, "addressable_shards", None)
    if shards:
        for shard in shards:
            if getattr(shard, "replica_id", 0) != 0:
                continue  # replicated copies: write each row range once
            start = shard.index[0].start or 0
            data = np.asarray(shard.data)
            for ofs in range(0, data.shape[0], slab_rows):
                yield start + ofs, data[ofs:ofs + slab_rows]
    else:
        for ofs in range(0, arr.shape[0], slab_rows):
            yield ofs, np.asarray(arr[ofs:ofs + slab_rows])


def save_state_chunked(path: str, state: SMCState,
                       max_bytes: int = 64 * 2**20) -> str:
    """Bounded-host-memory checkpoint: a ``.smcd`` directory with one
    memory-mapped ``.npy`` per field, filled in row slabs of at most
    ``max_bytes`` each. Equivalent content to ``save_state``'s .npz;
    use when the full state does not fit (or should not transit) host
    RAM in one piece (e.g. 1e8-particle mesh runs)."""
    path = str(path)
    if not path.endswith(".smcd"):
        path += ".smcd"
    os.makedirs(path, exist_ok=True)
    meta = {"format": "smcd", "version": 1, "fields": []}
    flat_small = {}
    for f in dataclasses.fields(state):
        if f.name == "key":
            continue
        arr = getattr(state, f.name)
        if getattr(arr, "ndim", 0) >= 1 and arr.shape[0] > 1:
            mm = np.lib.format.open_memmap(
                os.path.join(path, f.name + ".npy"), mode="w+",
                dtype=np.dtype(arr.dtype.name), shape=tuple(arr.shape))
            for ofs, slab in _iter_row_slabs(arr, max_bytes):
                mm[ofs:ofs + slab.shape[0]] = slab
            mm.flush()
            del mm
            meta["fields"].append({"name": f.name, "kind": "npy"})
        else:
            flat_small[f.name] = np.asarray(arr).tolist()
            meta["fields"].append({"name": f.name, "kind": "scalar",
                                   "dtype": np.asarray(arr).dtype.name})
    meta["scalars"] = flat_small
    meta["key"] = np.asarray(jax.random.key_data(state.key)).tolist()
    with open(os.path.join(path, "meta.json"), "w") as fh:
        json.dump(meta, fh)
    return path


def _load_state_chunked(path: str) -> SMCState:
    with open(os.path.join(path, "meta.json")) as fh:
        meta = json.load(fh)
    d = {}
    for spec in meta["fields"]:
        name = spec["name"]
        if spec["kind"] == "npy":
            d[name] = np.load(os.path.join(path, name + ".npy"))
        else:
            d[name] = np.asarray(meta["scalars"][name],
                                 dtype=np.dtype(spec["dtype"]))
    d["key"] = np.asarray(meta["key"], dtype=np.uint32)
    return _unflatten(d)


def load_state(path: str) -> SMCState:
    path = str(path)
    if os.path.isdir(path) or path.endswith(".smcd"):
        return _load_state_chunked(path)
    if path.endswith(".smck"):
        from smc_tpu.runtime import load_snapshot
        return _unflatten(load_snapshot(path))
    z = np.load(path if path.endswith(".npz") else path + ".npz")
    return _unflatten({k: z[k] for k in z.files})
