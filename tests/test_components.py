"""Component-parity tests: prior modes, CSV loaders, diagnostics, errors."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smc_tpu.models import methanation as M
from smc_tpu.models.michaelis_menten import MichaelisMentenModel
from smc_tpu.priors import NORMAL, UNIFORM
from smc_tpu.smc.diagnostics import (normalized_ess,
                                     unique_ancestor_fraction,
                                     failed_solve_count)


def test_methanation_prior_modes():
    uni = M.methanation_prior(mode="uniform")
    assert (np.asarray(uni.kind) == UNIFORM).all()
    nor = M.methanation_prior(mode="normal")
    assert (np.asarray(nor.kind) == NORMAL).all()
    np.testing.assert_allclose(np.asarray(nor.loc)[0], 13.04, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(nor.scale)[0], 0.5 * 13.04,
                               rtol=1e-6)
    # taylor: est subset (0,1,2,3,8) is entirely in UNI_LIST -> all uniform
    tay = M.methanation_prior(mode="taylor")
    assert (np.asarray(tay.kind) == UNIFORM).all()
    # with a non-UNI parameter estimated, taylor mixes kinds
    tay2 = M.methanation_prior(est_idx=(0, 4, 8), mode="taylor")
    np.testing.assert_array_equal(np.asarray(tay2.kind),
                                  [UNIFORM, NORMAL, UNIFORM])
    with pytest.raises(ValueError):
        M.methanation_prior(mode="bogus")


def test_conditions_csv_roundtrip(tmp_path):
    cond = M.make_condition_table(6)
    path = str(tmp_path / "conditions.csv")
    cond.to_csv(path)
    back = M.Conditions.from_csv(path)
    for field in ("C_in", "T_in", "T_jacket", "u_in", "void", "dz", "P0"):
        np.testing.assert_allclose(np.asarray(getattr(back, field)),
                                   np.asarray(getattr(cond, field)),
                                   rtol=2e-5)


def test_mm_from_csv_dir(tmp_path):
    from smc_tpu.cli import main
    d = str(tmp_path / "data")
    assert main(["generate-data", "--outdir", d]) == 0
    m_csv = MichaelisMentenModel.from_csv_dir(d, method="exact")
    m_gen = MichaelisMentenModel.default(method="exact")
    np.testing.assert_allclose(np.asarray(m_csv.obs), np.asarray(m_gen.obs),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(m_csv.s0), np.asarray(m_gen.s0))
    theta = jnp.asarray([[1.2, 0.5, 0.02]])
    ll_a, _ = m_csv.log_likelihood(theta)
    ll_b, _ = m_gen.log_likelihood(theta)
    np.testing.assert_allclose(np.asarray(ll_a), np.asarray(ll_b), rtol=1e-4)


def test_diagnostics():
    w = jnp.ones(100) / 100
    assert float(normalized_ess(w)) == pytest.approx(1.0)
    anc = jnp.asarray([0, 0, 0, 5, 5, 4], jnp.int32)
    assert float(unique_ancestor_fraction(anc)) == pytest.approx(3 / 6)
    flows = jnp.zeros((4, 5, 3)).at[1, :, 2].set(-10000.0).at[3].set(-10000.0)
    assert int(failed_solve_count(flows)) == 1 + 3


def test_runner_error_capture(tmp_path):
    from smc_tpu.runner import run_with_artifacts
    from smc_tpu.io.rundir import RunDir
    from smc_tpu import SMCConfig

    class BrokenModel:
        param_names = ("x",)
        from smc_tpu.priors import Prior
        prior = Prior.uniform([0.0], [1.0])

        def log_likelihood(self, theta):
            raise RuntimeError("simulated failure")

    rd = RunDir(root=str(tmp_path), tag="broken")
    with pytest.raises(RuntimeError):
        run_with_artifacts(BrokenModel(), SMCConfig(n_particles=8),
                           jax.random.key(0), rundir=rd, verbose=False)
    import os
    assert os.path.exists(rd.file("error.log"))
    assert "simulated failure" in open(rd.file("error.log")).read()

def test_mm_dopri5_method():
    m = MichaelisMentenModel.default(method="dopri5")
    m_ex = MichaelisMentenModel.default(method="exact")
    theta = jnp.asarray([[1.2, 0.5, 0.02], [2.0, 1.0, 0.1]], jnp.float32)
    ll_d, _ = m.log_likelihood(theta)
    ll_e, _ = m_ex.log_likelihood(theta)
    np.testing.assert_allclose(np.asarray(ll_d), np.asarray(ll_e), rtol=5e-3,
                               atol=0.5)


def test_methanation_molfractions():
    m = M.MethanationModel.default(n_conditions=3, nx=15, n_steps=20,
                                   growth=1.5, engine="blocked")
    frac = np.asarray(m.simulate_molfractions(
        jnp.asarray(M.KIN_TRUE, jnp.float32)))
    assert frac.shape == (5, 3)
    np.testing.assert_allclose(frac.sum(0), 1.0, rtol=1e-5)
    assert (frac >= 0).all() and (frac <= 1).all()


def test_memory_report_no_crash():
    from smc_tpu.utils.memory import device_memory_report, hbm_utilization
    r = device_memory_report()
    assert isinstance(r, list)
    u = hbm_utilization()
    assert u is None or 0 <= u <= 1.5


def test_cli_generate_methanation_data(tmp_path):
    from smc_tpu.cli import main
    d = str(tmp_path / "md")
    rc = main(["generate-data", "--model", "methanation",
               "--conditions", "3", "--outdir", d])
    assert rc == 0
    import os
    data = np.loadtxt(os.path.join(d, "data.csv"), delimiter=",")
    mol = np.loadtxt(os.path.join(d, "data_mol.csv"), delimiter=",")
    assert data.shape == (5, 3) and mol.shape == (5, 3)
    np.testing.assert_allclose(mol.sum(0), 1.0, rtol=1e-5)
    from smc_tpu.models.methanation import Conditions
    c = Conditions.from_csv(os.path.join(d, "conditions.csv"))
    assert c.n_data == 3


def test_methanation_from_csv_real_data_mode(tmp_path):
    import os
    from smc_tpu.cli import main
    d = str(tmp_path / "md")
    assert main(["generate-data", "--model", "methanation",
                 "--conditions", "2", "--outdir", d]) == 0
    m = M.MethanationModel.from_csv(os.path.join(d, "conditions.csv"),
                                    os.path.join(d, "data.csv"),
                                    nx=15, n_steps=20, growth=1.5,
                                    engine="blocked")
    theta = jnp.asarray([[13.04, 52.2e3, 1.147e5, 96.7e3, 5.0]], jnp.float32)
    ll, _ = m.log_likelihood(theta)
    assert np.isfinite(np.asarray(ll)).all()


def test_config_validation():
    from smc_tpu import SMCConfig
    with pytest.raises(ValueError):
        SMCConfig(n_particles=1)
    with pytest.raises(ValueError):
        SMCConfig(ess_limit=0.0)
    with pytest.raises(ValueError):
        SMCConfig(gamma_reduction_rate=1.0)
    with pytest.raises(ValueError):
        SMCConfig(resampling="bogus")
    SMCConfig()  # defaults valid


def test_lu7_array_forms_match_loop_forms():
    """The array-form block LU/solves (lu7_*_arr, the small-op-scheduling
    experiment) must reproduce the unrolled loop forms: the factor is
    arithmetic-identical (bitwise); substitutions differ only by fp
    reassociation."""
    import numpy as np
    import jax.numpy as jnp
    from smc_tpu.ops import dae_fast as df

    rng = np.random.default_rng(0)
    B = 64
    A = rng.normal(size=(7, 7, B)).astype(np.float32)
    A[np.arange(7), np.arange(7)] += 8.0  # diagonally dominant
    rhs = rng.normal(size=(7, 3, B)).astype(np.float32)
    A, rhs = jnp.asarray(A), jnp.asarray(rhs)

    lu_loop = np.asarray(df.lu7_nopivot(A))
    lu_arr = np.asarray(df.lu7_nopivot_arr(A))
    np.testing.assert_array_equal(lu_arr, lu_loop)

    x_loop = np.asarray(df.lu7_solve(jnp.asarray(lu_loop), rhs))
    x_arr = np.asarray(df.lu7_solve_arr(jnp.asarray(lu_loop), rhs))
    np.testing.assert_allclose(x_arr, x_loop, rtol=2e-5, atol=1e-6)

    xt_loop = np.asarray(df.lu7_solve_T(jnp.asarray(lu_loop), rhs))
    xt_arr = np.asarray(df.lu7_solve_T_arr(jnp.asarray(lu_loop), rhs))
    np.testing.assert_allclose(xt_arr, xt_loop, rtol=2e-5, atol=1e-6)


def test_lu_arr_flag_march_equivalence():
    """The whole methanation likelihood with _LU_ARR on matches the default
    path (same Newton fixed point; fp-reassociation differences only)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from smc_tpu.ops import dae_fast as df
    from smc_tpu.models.methanation import MethanationModel

    model = MethanationModel.default(n_conditions=2, nx=11, n_steps=6,
                                     growth=1.6, particle_chunk=8)
    theta = model.prior.sample(jax.random.key(5), 8)
    ll_off, _ = jax.jit(model.log_likelihood)(theta)
    df._LU_ARR = True
    try:
        ll_on, _ = jax.jit(model.log_likelihood)(theta)
    finally:
        df._LU_ARR = False
    a, b = np.asarray(ll_on), np.asarray(ll_off)
    fin = np.isfinite(b)
    assert (np.isfinite(a) == fin).all()
    np.testing.assert_allclose(a[fin], b[fin], rtol=1e-3, atol=0.5)
