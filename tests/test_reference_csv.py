"""`Conditions.from_reference_csv` — the adapter for the reference's
positional 30-column information.csv layout
(methanation_set_conditon.py:137-215).

The reference repo does not ship the file itself, so the tests synthesize
one in that layout (junk values in every unused column so any off-by-one
indexing is caught) and assert the unit conversions against independently
computed float64 values using the reference's formulas: degC + 273 -> K,
gauge MPa*1e6 + 101325 -> Pa, total sccm (column 16, NOT the 5-flow sum)
-> inlet velocity, per-species flow fractions (the 5-flow sum, NOT column
16) -> inlet concentrations.
"""
import numpy as np
import pytest

from smc_tpu.models.methanation import AREA, R_GAS, Conditions

# column layout (methanation_set_conditon.py:194-217): index -> meaning
LEN_MM = [150.0, 120.0, 180.0]
TJ_C = [150.0, 165.0, 180.0]
VOID = [0.39, 0.40, 0.38]
TIN_C = [25.0, 30.0, 28.0]
P_MPA = [0.1, 0.0, 0.2]
# inlet flows sccm: H2(10) CO2(11) CH4(12) H2O(14) Ar(15); row1 H2O is an
# EMPTY cell (the loader's fillna(0))
FLOWS = np.array([[320.0, 80.0, 5.0, 0.0, 95.0],
                  [300.0, 75.0, 0.0, 0.0, 125.0],
                  [280.0, 70.0, 3.0, 2.0, 145.0]])
# column 16 "total flow" deliberately differs from the 5-flow sum in row 1:
# u_in must use column 16, concentrations must use the 5-flow sum
TOT = [500.0, 505.0, 500.0]
OUT_FLOWS = np.array([[200.0, 20.0, 60.0, 40.0, 100.0],
                      [190.0, 18.0, 55.0, 35.0, 110.0],
                      [180.0, 16.0, 50.0, 30.0, 120.0]])
OUT_MOLF = np.array([[0.48, 0.05, 0.14, 0.09, 0.24],
                     [0.47, 0.04, 0.13, 0.08, 0.28],
                     [0.45, 0.04, 0.12, 0.07, 0.32]])


def _write_reference_csv(path):
    rows = []
    for r in range(3):
        row = [f"{1000 + 100 * r + c}" for c in range(30)]  # junk baseline
        row[4] = repr(LEN_MM[r])
        row[5] = repr(TJ_C[r])
        row[6] = repr(VOID[r])
        row[7] = repr(TIN_C[r])
        row[9] = repr(P_MPA[r])
        for j, c in enumerate((10, 11, 12, 14, 15)):
            row[c] = repr(float(FLOWS[r, j]))
        row[16] = repr(TOT[r])
        for j, c in enumerate((17, 18, 19, 21, 22)):
            row[c] = repr(float(OUT_FLOWS[r, j]))
        for j, c in enumerate((24, 25, 26, 28, 29)):
            row[c] = repr(float(OUT_MOLF[r, j]))
        rows.append(row)
    rows[1][14] = ""  # empty cell -> 0 (fillna)
    header = ",".join(f"col{c}" for c in range(30))
    with open(path, "w") as f:
        f.write(header + "\n")
        for row in rows:
            f.write(",".join(row) + "\n")
    return str(path)


def _expected(nx=51):
    t_in = np.array(TIN_C) + 273.0
    tj = np.array(TJ_C) + 273.0
    p_abs = np.array(P_MPA) * 1e6 + 101325.0
    u_in = (np.array(TOT) * 1.667e-8 / AREA
            * (101325.0 * t_in) / (p_abs * 298.0))
    c_in = (p_abs / (R_GAS * t_in))[:, None] * FLOWS / FLOWS.sum(1)[:, None]
    dz = np.array(LEN_MM) / 1000.0 / (nx - 1)
    return t_in, tj, p_abs, u_in, c_in, dz


def test_from_reference_csv_unit_conversions(tmp_path):
    path = _write_reference_csv(tmp_path / "information.csv")
    cond, obs_flows, obs_molf = Conditions.from_reference_csv(path)
    t_in, tj, p_abs, u_in, c_in, dz = _expected()

    rt = lambda a, b: np.testing.assert_allclose(
        np.asarray(a, np.float64), b, rtol=2e-5)
    rt(cond.T_in, t_in)
    rt(cond.T_jacket, tj)
    rt(cond.u_in, u_in)
    rt(cond.C_in, c_in)
    rt(cond.dz, dz)
    rt(cond.void, VOID)
    # concentrations sum to the ideal-gas total: P0 == absolute pressure
    rt(cond.P0, p_abs)
    rt(obs_flows, OUT_FLOWS.T)
    rt(obs_molf, OUT_MOLF.T)


def test_from_reference_csv_datalist_selects_rows(tmp_path):
    """datalist selects the LISTED rows by index (documented deviation from
    the reference's contiguous iloc[first:last+1] slice)."""
    path = _write_reference_csv(tmp_path / "information.csv")
    cond, obs_flows, _ = Conditions.from_reference_csv(path,
                                                       datalist=(0, 2))
    assert cond.n_data == 2
    np.testing.assert_allclose(np.asarray(cond.T_in, np.float64),
                               np.array([TIN_C[0], TIN_C[2]]) + 273.0,
                               rtol=2e-5)
    np.testing.assert_allclose(np.asarray(obs_flows, np.float64),
                               OUT_FLOWS[(0, 2), :].T, rtol=2e-5)


def test_reference_csv_roundtrip_through_clean_schema(tmp_path):
    """Conditions loaded from the reference layout, written back through the
    clean schema (to_csv), and reloaded (from_csv) are identical — the two
    loaders implement the same unit conversions."""
    path = _write_reference_csv(tmp_path / "information.csv")
    cond, _, _ = Conditions.from_reference_csv(path)
    out = tmp_path / "conditions.csv"
    cond.to_csv(str(out))
    cond2 = Conditions.from_csv(str(out))
    for k in ("C_in", "T_in", "T_jacket", "u_in", "void", "dz", "P0"):
        np.testing.assert_allclose(np.asarray(getattr(cond2, k)),
                                   np.asarray(getattr(cond, k)), rtol=1e-4)


def test_model_from_reference_csv_builds_and_evaluates(tmp_path):
    """MethanationModel.from_reference_csv uses the file's measured outlet
    flows as observations and produces a finite likelihood at the truth."""
    import jax
    import jax.numpy as jnp

    from smc_tpu.models.methanation import KIN_TRUE, MethanationModel

    path = _write_reference_csv(tmp_path / "information.csv")
    model = MethanationModel.from_reference_csv(
        path, nx=11, n_steps=6, particle_chunk=2)
    np.testing.assert_allclose(np.asarray(model.obs, np.float64),
                               OUT_FLOWS.T, rtol=2e-5)
    theta = jnp.tile(jnp.asarray(
        [KIN_TRUE[i] if i < 8 else 5.0 for i in model.est_idx],
        jnp.float32), (2, 1))
    ll, _ = jax.jit(model.log_likelihood)(theta)
    assert np.isfinite(np.asarray(ll)).all()


def test_cli_run_information_csv(tmp_path, capsys):
    """Full CLI path: --information-csv + --datalist + --nx on a minimal
    run config (the round-2 verdict's 'first real exercise would be in a
    user's hands' gap)."""
    from smc_tpu.cli import main

    path = _write_reference_csv(tmp_path / "information.csv")
    rc = main(["run", "--model", "methanation",
               "--information-csv", path, "--datalist", "0",
               "--nx", "11", "--particles", "8", "--chunk", "8",
               "--max-steps", "1", "--mh-steps", "1",
               "--mh-steps-final", "1",
               "--outdir", str(tmp_path / "runs"), "--quiet", "--no-plots"])
    assert rc == 0
    assert "gamma" in capsys.readouterr().out
