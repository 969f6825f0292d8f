"""Crash/stall-resilient execution (utils/resilient.py).

The reference's only recovery mechanism is the Ray memory watchdog
(methanation_functions.py:73-78). Here recovery is checkpoint-based:
run_resilient retries around per-step checkpoints in-process, supervise
restarts a worker process. Both use a progress-aware retry budget; these
tests inject failures mid-run on CPU and pin the recovery semantics.
"""
import os
import subprocess
import sys
import textwrap

import jax
import numpy as np
import pytest

from smc_tpu import SMCConfig
from smc_tpu.models.michaelis_menten import MichaelisMentenModel
from smc_tpu.utils.resilient import (checkpoint_exists, run_resilient,
                                     supervise)


@pytest.fixture(scope="module")
def model():
    return MichaelisMentenModel.default(method="exact")


def _cfg():
    return SMCConfig(n_particles=256)


def test_recovers_from_midrun_failure(model, tmp_path):
    """One injected failure at step 2: the run reloads the step-2
    checkpoint and completes; only the in-flight step is retried."""
    ckpt = str(tmp_path / "ck.npz")
    boom = {"armed": True, "failed_at": None, "steps_seen": []}

    def cb(st):
        boom["steps_seen"].append(int(st.step))
        if boom["armed"] and int(st.step) == 2:
            boom["armed"] = False
            boom["failed_at"] = int(st.step)
            raise RuntimeError("injected worker crash")

    st = run_resilient(model, _cfg(), jax.random.key(0), checkpoint=ckpt,
                       callback=cb, retry_delay_s=0.0, verbose=False)
    assert float(st.gamma) == 1.0
    assert boom["failed_at"] == 2
    # resumed AT the checkpointed step, not from scratch: step 1 appears
    # exactly once, step 3 follows the re-raised step-2 checkpoint
    assert boom["steps_seen"].count(1) == 1
    assert 3 in boom["steps_seen"]
    assert checkpoint_exists(ckpt)


def test_progress_refreshes_budget(model, tmp_path):
    """A failure after EVERY step with max_restarts=0 still completes:
    each attempt advances one step, so the no-progress budget is never
    consumed (the long-run survival property the 1e6 run relies on)."""
    ckpt = str(tmp_path / "ck.npz")
    n_fail = {"n": 0}

    def cb(st):
        n_fail["n"] += 1
        raise RuntimeError("crash after every step")

    st = run_resilient(model, _cfg(), jax.random.key(1), checkpoint=ckpt,
                       callback=cb, max_restarts=0, retry_delay_s=0.0,
                       verbose=False)
    assert float(st.gamma) == 1.0
    assert n_fail["n"] == int(st.step)  # one injected crash per step


def test_exhausts_no_progress_budget(model, tmp_path, monkeypatch):
    """Failures with no step progress stop after max_restarts retries and
    re-raise the last error."""
    from smc_tpu.smc import driver as drv
    calls = {"n": 0}

    def always_fail(*a, **k):
        calls["n"] += 1
        raise ValueError("permanently broken")

    monkeypatch.setattr(drv, "run_smc", always_fail)
    with pytest.raises(ValueError, match="permanently broken"):
        run_resilient(model, _cfg(), jax.random.key(2),
                      checkpoint=str(tmp_path / "ck.npz"),
                      max_restarts=2, retry_delay_s=0.0, verbose=False)
    # attempt 1 fails -> reload finds the post-init step-0 checkpoint
    # (progress vs -1, budget refreshed), then 1 + max_restarts
    # no-progress attempts
    assert calls["n"] == 4


def test_resumes_from_existing_checkpoint(model, tmp_path):
    """resume=True picks up a checkpoint left by a killed process (the
    supervise() re-exec path)."""
    from smc_tpu.io.checkpoint import load_state, save_state
    from smc_tpu.smc.driver import init_state, make_smc_step
    ckpt = str(tmp_path / "ck.npz")
    cfg = _cfg()
    s0 = init_state(jax.random.key(3), model, cfg)
    step = make_smc_step(model, cfg, donate=False)
    s2 = step(step(s0))
    save_state(ckpt, s2)

    seen = []
    st = run_resilient(model, cfg, jax.random.key(99), checkpoint=ckpt,
                       callback=lambda s: seen.append(int(s.step)),
                       retry_delay_s=0.0, verbose=False)
    assert float(st.gamma) == 1.0
    assert min(seen) == 3  # continued after the saved step-2 state
    # the checkpointed trajectory IS the uninterrupted one
    ref = s2
    while float(ref.gamma) < 1.0 and int(ref.step) < cfg.max_steps:
        ref = step(ref)
    np.testing.assert_array_equal(np.asarray(st.particles),
                                  np.asarray(ref.particles))


def test_checkpoint_exists_spellings(tmp_path):
    assert not checkpoint_exists(str(tmp_path / "nope.npz"))
    p = tmp_path / "a.npz"
    p.write_bytes(b"x")
    assert checkpoint_exists(str(p))
    # np.savez appends .npz: bare path must still be found
    assert checkpoint_exists(str(tmp_path / "a"))
    d = tmp_path / "ck.smcd"
    d.mkdir()
    assert not checkpoint_exists(str(d))  # dir without meta.json
    (d / "meta.json").write_text("{}")
    assert checkpoint_exists(str(d))


_CHILD = textwrap.dedent("""
    import os, sys, time
    cnt_file, prog_file, fail_until = sys.argv[1], sys.argv[2], int(sys.argv[3])
    n = int(open(cnt_file).read()) if os.path.exists(cnt_file) else 0
    n += 1
    open(cnt_file, "w").write(str(n))
    if prog_file != "-":
        # monotone mtime even within one clock tick
        open(prog_file, "w").write(str(n))
        os.utime(prog_file, (n, n))
    sys.exit(0 if n >= fail_until else 3)
""")


def _child_argv(tmp_path, prog: bool, fail_until: int):
    script = tmp_path / "child.py"
    script.write_text(_CHILD)
    cnt = tmp_path / "count.txt"
    prog_file = str(tmp_path / "prog.npz") if prog else "-"
    return ([sys.executable, str(script), str(cnt), prog_file,
             str(fail_until)], cnt, prog_file)


def test_supervise_restarts_until_success(tmp_path):
    """Each attempt advances the progress file, so max_restarts=0 still
    tolerates arbitrarily many crashes."""
    argv, cnt, prog = _child_argv(tmp_path, prog=True, fail_until=4)
    rc = supervise(argv, progress_file=prog, max_restarts=0,
                   retry_delay_s=0.0)
    assert rc == 0
    assert int(cnt.read_text()) == 4


def test_supervise_exhausts_budget(tmp_path):
    argv, cnt, _ = _child_argv(tmp_path, prog=False, fail_until=10**9)
    rc = supervise(argv, max_restarts=2, retry_delay_s=0.0)
    assert rc == 3
    assert int(cnt.read_text()) == 3  # 1 + max_restarts attempts


def test_supervise_passes_env(tmp_path):
    script = tmp_path / "env.py"
    script.write_text("import os,sys; sys.exit(0 if "
                      "os.environ.get('SMC_T')=='1' else 5)")
    assert supervise([sys.executable, str(script)], env={"SMC_T": "1"},
                     max_restarts=0, retry_delay_s=0.0) == 0


def test_stop_file_between_steps(model, tmp_path):
    """Cooperative preemption: touching stop_file makes the run return its
    last completed (checkpointed) step instead of tempering to gamma=1 —
    the only safe way to stop a detached run on the single-chip tunnel."""
    ckpt = str(tmp_path / "ck.npz")
    stop = str(tmp_path / "STOP")

    def cb(st):
        if int(st.step) == 2:
            open(stop, "w").close()

    st = run_resilient(model, _cfg(), jax.random.key(3), checkpoint=ckpt,
                       callback=cb, retry_delay_s=0.0, verbose=False,
                       stop_file=stop)
    assert int(st.step) == 2
    assert float(st.gamma) < 1.0
    # the returned state is exactly the checkpointed one: a later resume
    # continues from here (remove the stop file first) and completes
    os.remove(stop)
    st2 = run_resilient(model, _cfg(), jax.random.key(3), checkpoint=ckpt,
                        retry_delay_s=0.0, verbose=False, stop_file=stop)
    assert float(st2.gamma) == 1.0
    assert int(st2.step) > 2


def test_stop_file_mid_step_block_granularity(model, tmp_path):
    """A stop file present before the first block execution aborts the
    in-flight step and returns the last completed state (block granularity
    polls between ~1-min device executions at 1e6 scale)."""
    from smc_tpu.smc.driver import init_state, run_smc

    cfg = SMCConfig(n_particles=256, block_particles=64)
    stop = str(tmp_path / "STOP")
    st0 = init_state(jax.random.key(4), model, cfg)
    open(stop, "w").close()
    st = run_smc(model, cfg, jax.random.key(4), state=st0, verbose=False,
                 granularity="block", stop_file=stop)
    assert int(st.step) == int(st0.step)
    assert float(st.gamma) == float(st0.gamma)
