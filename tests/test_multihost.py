"""Multi-host helpers: failure semantics + primary-host IO gating.

The reference is single-node Ray only (SURVEY §2 parallelism table); the
pod path here must never silently degrade — a real ``jax.distributed``
init failure has to raise, and non-primary hosts must not write artifacts.
All tests monkeypatch jax (no real pod is reachable from CI).
"""
import os

import jax
import pytest

from smc_tpu.parallel import multihost


def test_autodetect_miss_is_single_process_noop(monkeypatch):
    def fake_init(**kw):
        raise ValueError("coordinator_address should be defined.")
    monkeypatch.setattr(jax.distributed, "initialize", fake_init)
    assert multihost.initialize_distributed() == len(jax.devices())


def test_double_initialize_is_idempotent(monkeypatch):
    def fake_init(**kw):
        raise RuntimeError("distributed.initialize should only be called "
                           "once.")
    monkeypatch.setattr(jax.distributed, "initialize", fake_init)
    assert multihost.initialize_distributed() == len(jax.devices())


def test_real_init_failure_raises(monkeypatch):
    def fake_init(**kw):
        raise RuntimeError("Failed to connect to coordinator 10.0.0.1:1234")
    monkeypatch.setattr(jax.distributed, "initialize", fake_init)
    with pytest.raises(RuntimeError, match="coordinator"):
        multihost.initialize_distributed()


def test_explicit_args_failure_raises(monkeypatch):
    """With explicit pod arguments even the autodetect-style ValueError is a
    real failure: the caller asked for a pod and must not get a silent
    single-process run."""
    def fake_init(**kw):
        raise ValueError("coordinator_address should be defined.")
    monkeypatch.setattr(jax.distributed, "initialize", fake_init)
    with pytest.raises(ValueError):
        multihost.initialize_distributed(coordinator_address="10.0.0.1:1234",
                                         num_processes=2, process_id=0)


def test_is_primary_host(monkeypatch):
    monkeypatch.setattr(jax, "process_index", lambda: 0)
    assert multihost.is_primary_host()
    monkeypatch.setattr(jax, "process_index", lambda: 3)
    assert not multihost.is_primary_host()


def test_run_with_artifacts_non_primary_writes_nothing(monkeypatch,
                                                       tmp_path):
    """A non-primary pod process runs the SMC compute but creates no run
    dir, writes no files, and returns rundir=None."""
    monkeypatch.setattr(jax, "process_index", lambda: 1)
    monkeypatch.chdir(tmp_path)

    from smc_tpu.config import SMCConfig
    from smc_tpu.models.synthetic import BananaModel
    from smc_tpu.runner import run_with_artifacts

    state, rd = run_with_artifacts(
        BananaModel(), SMCConfig(n_particles=128), jax.random.key(0),
        verbose=False)
    assert rd is None
    assert float(state.gamma) == 1.0
    assert os.listdir(tmp_path) == []  # nothing written anywhere under cwd
