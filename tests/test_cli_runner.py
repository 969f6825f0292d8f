"""CLI + runner smoke tests (fast models only)."""
import os

from smc_tpu.cli import main


def test_cli_run_banana(tmp_path, capsys):
    rc = main(["run", "--model", "banana", "--particles", "512",
               "--outdir", str(tmp_path), "--quiet", "--no-plots"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "gamma: 1.0" in out
    runs = os.listdir(tmp_path)
    assert len(runs) == 1
    assert os.path.exists(tmp_path / runs[0] / "Posterior_Distribution.csv")
    assert os.path.exists(tmp_path / runs[0] / "pred" / "last_p_pred.csv")
    assert os.path.exists(tmp_path / runs[0] / "checkpoints" / "final.npz")


def test_cli_run_block_granularity(tmp_path, capsys):
    rc = main(["run", "--model", "banana", "--particles", "512",
               "--granularity", "block", "--block-particles", "128",
               "--outdir", str(tmp_path), "--quiet", "--no-plots"])
    assert rc == 0
    assert "gamma: 1.0" in capsys.readouterr().out


def test_cli_run_max_restarts(tmp_path, capsys):
    """--max-restarts routes through utils/resilient.run_resilient and
    leaves a checkpoints/latest.npz for crash resume."""
    rc = main(["run", "--model", "banana", "--particles", "256",
               "--max-restarts", "2", "--outdir", str(tmp_path),
               "--quiet", "--no-plots"])
    assert rc == 0
    assert "gamma: 1.0" in capsys.readouterr().out
    run = tmp_path / os.listdir(tmp_path)[0]
    assert os.path.exists(run / "checkpoints" / "latest.npz")


def test_cli_run_mm_with_artifacts_and_resume(tmp_path, capsys):
    rc = main(["run", "--model", "mm", "--mm-method", "exact",
               "--particles", "128", "--outdir", str(tmp_path), "--quiet"])
    assert rc == 0
    run = tmp_path / os.listdir(tmp_path)[0]
    assert os.path.exists(run / "Posterior_Pairplot.png")
    assert os.path.exists(run / "Histgram_compare.png")
    assert os.path.exists(run / "config.json")
    ck = run / "checkpoints" / "step2.smck"
    if not os.path.exists(ck):  # no native toolchain -> sync .npz fallback
        ck = run / "checkpoints" / "step2.npz"
    assert os.path.exists(ck)
    rc = main(["resume", "--checkpoint", str(ck), "--model", "mm",
               "--mm-method", "exact", "--particles", "128",
               "--outdir", str(tmp_path), "--quiet", "--no-plots"])
    assert rc == 0
    assert "gamma: 1.0" in capsys.readouterr().out


def test_cli_run_smcd_checkpoints_and_resume(tmp_path, capsys):
    """--checkpoint-format smcd writes streaming-slab directories per step
    and a final.smcd, and resume accepts the directory path."""
    rc = main(["run", "--model", "banana", "--particles", "256",
               "--checkpoint-format", "smcd",
               "--outdir", str(tmp_path), "--quiet", "--no-plots"])
    assert rc == 0
    run = tmp_path / os.listdir(tmp_path)[0]
    final = run / "checkpoints" / "final.smcd"
    assert os.path.isdir(final)
    assert os.path.exists(final / "particles.npy")
    assert os.path.exists(final / "meta.json")
    steps = [d for d in os.listdir(run / "checkpoints")
             if d.startswith("step") and d.endswith(".smcd")]
    assert steps
    rc = main(["resume", "--checkpoint", str(run / "checkpoints" / steps[0]),
               "--model", "banana", "--particles", "256",
               "--outdir", str(tmp_path), "--quiet", "--no-plots"])
    assert rc == 0
    assert "gamma: 1.0" in capsys.readouterr().out


def test_cli_generate_data(tmp_path):
    rc = main(["generate-data", "--outdir", str(tmp_path / "d")])
    assert rc == 0
    import numpy as np
    for i in range(6):
        path = tmp_path / "d" / f"mm_pseudo_data_{i}.csv"
        assert os.path.exists(path)
        assert open(path).readline().strip() == "t,S_true,P_true,P_obs"
        arr = np.loadtxt(path, delimiter=",", skiprows=1)
        assert arr.shape == (40, 4)


def test_cli_ensemble(capsys):
    """smc-tpu ensemble: every population reports gamma=1 and a mean line;
    --method pallas_exact routes all populations through the batched
    Lambert-W kernel (interpret mode on the CPU test platform)."""
    rc = main(["ensemble", "--datasets", "2", "--particles", "64",
               "--method", "pallas_exact"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "dataset 0: gamma=1.000" in out
    assert "dataset 1: gamma=1.000" in out


def test_cli_run_stop_file_preempts_and_resumes(tmp_path, capsys):
    """--stop-file present from the start: the run finalizes immediately
    with its initial state (artifacts + checkpoint written), and a later
    'resume' without the stop file completes to gamma=1 — the cooperative
    preemption surface for long detached runs."""
    stop = tmp_path / "STOP"
    stop.write_text("")
    rc = main(["run", "--model", "banana", "--particles", "256",
               "--stop-file", str(stop), "--outdir", str(tmp_path / "o"),
               "--quiet", "--no-plots"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "gamma: 0.0" in out  # preempted before any step
    run = tmp_path / "o" / os.listdir(tmp_path / "o")[0]
    ck = run / "checkpoints" / "final.npz"
    assert os.path.exists(ck)
    os.remove(stop)
    rc = main(["resume", "--checkpoint", str(ck), "--model", "banana",
               "--particles", "256", "--outdir", str(tmp_path / "o"),
               "--quiet", "--no-plots"])
    assert rc == 0
    assert "gamma: 1.0" in capsys.readouterr().out
