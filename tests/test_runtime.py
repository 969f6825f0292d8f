"""Native runtime tests: build, async checkpointing, oracle parity."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smc_tpu.runtime import (AsyncCheckpointer, load_snapshot,
                             save_snapshot_py, native_available,
                             residual_systematic_oracle)
from smc_tpu.smc.kernels import residual_systematic_counts


def test_native_library_builds():
    assert native_available(), "g++ build of smc_runtime.cc failed"


def test_async_checkpoint_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    snaps = {
        "particles": rng.normal(size=(1000, 5)).astype(np.float32),
        "log_lik": rng.normal(size=(1000,)).astype(np.float32),
        "gamma": np.asarray(0.37, np.float32),
        "step": np.asarray(4, np.int32),
        "key": rng.integers(0, 2**32, size=(2,), dtype=np.uint32),
    }
    with AsyncCheckpointer() as ck:
        assert ck.is_native
        for i in range(8):
            path = str(tmp_path / f"snap{i}.smck")
            ck.submit(path, {k: v + (i if v.dtype.kind == "f" else 0)
                             for k, v in snaps.items()})
        ck.flush()
        stats = ck.stats()
        assert stats["written"] == 8 and stats["errors"] == 0
    back = load_snapshot(str(tmp_path / "snap3.smck"))
    np.testing.assert_allclose(back["particles"], snaps["particles"] + 3)
    np.testing.assert_array_equal(back["step"], snaps["step"])
    np.testing.assert_array_equal(back["key"], snaps["key"])


def test_python_writer_same_container(tmp_path):
    arrays = {"a": np.arange(12, dtype=np.int64).reshape(3, 4)}
    p = str(tmp_path / "py.smck")
    save_snapshot_py(p, arrays)
    back = load_snapshot(p)
    np.testing.assert_array_equal(back["a"], arrays["a"])


def test_tpu_resampler_matches_cpp_oracle():
    """The vectorized TPU counts kernel == the native sequential Algorithm 2
    for the same uniform draw (up to one fp32-cumsum boundary tie)."""
    rng = np.random.default_rng(5)
    for n in [64, 1000, 5000]:
        w = rng.dirichlet(np.ones(n) * 0.5)
        key = jax.random.key(123)
        v0 = float(jax.random.uniform(key, ()))
        ours = np.asarray(residual_systematic_counts(
            key, jnp.asarray(w, jnp.float32)))
        oracle = residual_systematic_oracle(w.astype(np.float32), v0)
        assert ours.sum() == n == oracle.sum()
        diff = np.abs(ours - oracle)
        assert diff.max() <= 1
        assert (diff > 0).sum() <= 4
