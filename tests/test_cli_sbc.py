"""CLI `smc-tpu sbc` smoke: the calibration check runs end-to-end, prints
per-dimension rank statistics, writes the rank table, and exits 0 on a
calibrated sampler (library-level power/uniformity tests live in
tests/test_sbc.py)."""
import os

from smc_tpu.cli import main


def test_cli_sbc_mm(tmp_path, capsys):
    csv = str(tmp_path / "ranks.csv")
    rc = main(["sbc", "--model", "mm", "--replicates", "16",
               "--particles", "128", "--rank-draws", "31",
               "--ranks-csv", csv])
    out = capsys.readouterr().out
    assert rc == 0, out
    assert "calibrated: True" in out
    assert "Vmax" in out and "chi2" in out
    assert os.path.exists(csv)
    with open(csv) as f:
        lines = f.read().strip().splitlines()
    assert lines[0] == "Vmax,Km,sigma"
    assert len(lines) == 1 + 16
    ranks = [int(v) for v in lines[1].split(",")]
    assert all(0 <= r <= 31 for r in ranks)
