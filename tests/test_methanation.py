"""Methanation model tests: physics invariants, engine cross-checks, and a
small self-consistency posterior run (SURVEY.md §4 strategy).

CPU note: the lanes-major (batch_last) engine is tuned for TPU lane widths
and is op-dispatch-bound at test sizes on CPU, so these tests run the
"blocked" oracle engine except for one tiny cross-check. Set
SMC_TPU_SLOW=1 to enable the full end-to-end posterior test.
"""
import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smc_tpu.models import methanation as M
from smc_tpu.ops.linalg import solve_small
from smc_tpu.ops.dae_fast import solve7, block_thomas_bl

SLOW = os.environ.get("SMC_TPU_SLOW") == "1"


@pytest.fixture(scope="module")
def small_model():
    return M.MethanationModel.default(
        n_conditions=3, nx=15, n_steps=20, growth=1.5,
        engine="blocked", particle_chunk=64)


def test_solve_small_matches_numpy():
    rng = np.random.default_rng(0)
    A = rng.normal(size=(33, 7, 7)).astype(np.float32)
    A[:, 0, 0] = 0.0  # force pivoting
    b = rng.normal(size=(33, 7)).astype(np.float32)
    x = np.asarray(solve_small(jnp.asarray(A), jnp.asarray(b)))
    ref = np.linalg.solve(A.astype(np.float64),
                          b.astype(np.float64)[..., None])[..., 0]
    np.testing.assert_allclose(x, ref, rtol=2e-3, atol=1e-4)


def test_solve7_matches_numpy():
    rng = np.random.default_rng(0)
    A = rng.normal(size=(7, 7, 33)).astype(np.float32)
    A[0, 0] = 0.0  # force pivoting
    b = rng.normal(size=(7, 2, 33)).astype(np.float32)
    x = np.asarray(solve7(jnp.asarray(A), jnp.asarray(b)))
    Ab = np.moveaxis(A, -1, 0)
    bb = np.moveaxis(b, -1, 0)
    ref = np.linalg.solve(Ab.astype(np.float64), bb.astype(np.float64))
    np.testing.assert_allclose(x, np.moveaxis(ref, 0, -1), rtol=2e-3,
                               atol=1e-4)


def test_block_thomas_bl_matches_dense():
    rng = np.random.default_rng(1)
    nx, b, bt = 9, 7, 4
    A = rng.normal(size=(nx, b, b, bt)).astype(np.float32) * 0.3
    B = rng.normal(size=(nx, b, b, bt)).astype(np.float32) \
        + 4.0 * np.eye(b)[None, :, :, None].astype(np.float32)
    C = rng.normal(size=(nx, b, b, bt)).astype(np.float32) * 0.3
    A[0] = 0
    C[-1] = 0
    r = rng.normal(size=(nx, b, bt)).astype(np.float32)
    x = np.asarray(block_thomas_bl(*map(jnp.asarray, (A, B, C, r))))
    for t in range(bt):
        dense = np.zeros((nx * b, nx * b))
        for i in range(nx):
            dense[i*b:(i+1)*b, i*b:(i+1)*b] = B[i, :, :, t]
            if i > 0:
                dense[i*b:(i+1)*b, (i-1)*b:i*b] = A[i, :, :, t]
            if i < nx - 1:
                dense[i*b:(i+1)*b, (i+1)*b:(i+2)*b] = C[i, :, :, t]
        ref = np.linalg.solve(dense, r[:, :, t].ravel()).reshape(nx, b)
        np.testing.assert_allclose(x[:, :, t], ref, rtol=3e-3, atol=2e-4)


def test_block_thomas_factor_apply_matches_separate():
    """Fused factor+first-solve sweep == factor then apply (the non-default
    _FUSED_FACTOR=True path; measured slower on v5e but kept reproducible —
    see ops/dae_fast.py)."""
    from smc_tpu.ops.dae_fast import (block_thomas_apply,
                                      block_thomas_factor,
                                      block_thomas_factor_apply)
    rng = np.random.default_rng(3)
    nx, b, bt = 11, 7, 5
    A = rng.normal(size=(nx, b, b, bt)).astype(np.float32) * 0.3
    B = rng.normal(size=(nx, b, b, bt)).astype(np.float32) \
        + 4.0 * np.eye(b)[None, :, :, None].astype(np.float32)
    C = rng.normal(size=(nx, b, b, bt)).astype(np.float32) * 0.3
    A[0] = 0
    C[-1] = 0
    r = rng.normal(size=(nx, b, bt)).astype(np.float32)
    A, B, C, r = map(jnp.asarray, (A, B, C, r))
    (LUs_f, ms_f), x_fused = block_thomas_factor_apply(A, B, C, r)
    LUs, ms = block_thomas_factor(A, B, C)
    x_sep = block_thomas_apply(LUs, ms, C, r)
    # fp32 envelope, not bitwise: the separate path's full-length scans
    # (zero-init edge handling) group the unrolled reduce chains
    # differently from the fused sweep.
    np.testing.assert_allclose(np.asarray(x_fused), np.asarray(x_sep),
                               rtol=5e-4, atol=5e-5)
    np.testing.assert_allclose(np.asarray(LUs_f), np.asarray(LUs),
                               rtol=2e-4, atol=5e-5)
    np.testing.assert_array_equal(np.asarray(ms_f), np.asarray(ms))


def test_block_cyclic_reduction_matches_thomas():
    """CR factors+apply == pivoted Thomas on random systems (several sizes
    incl. non-2^k-1 padding) AND on real methanation Jacobian blocks whose
    outlet boundary block is a u/T permutation (structurally unpivotable —
    the case that forces the stored-pivot LU at level 0)."""
    from smc_tpu.ops.dae_fast import block_cr_factor, block_cr_apply
    rng = np.random.default_rng(2)
    b = 7
    for nx in (1, 2, 5, 8, 51):
        bt = 3
        A = rng.normal(size=(nx, b, b, bt)).astype(np.float32) * 0.3
        B = rng.normal(size=(nx, b, b, bt)).astype(np.float32) \
            + 4.0 * np.eye(b)[None, :, :, None].astype(np.float32)
        C = rng.normal(size=(nx, b, b, bt)).astype(np.float32) * 0.3
        A[0] = 0
        C[-1] = 0
        # outlet-like permutation block: zero diagonal, off-diagonal ones
        B[-1] = np.eye(b)[None, :, :, None]
        B[-1, 5, 5] = B[-1, 6, 6] = 0.0
        B[-1, 5, 6] = B[-1, 6, 5] = 1.0
        r = rng.normal(size=(nx, b, bt)).astype(np.float32)
        A, B, C, r = map(jnp.asarray, (A, B, C, r))
        x_ref = np.asarray(block_thomas_bl(A, B, C, r, pivot=True))
        x_cr = np.asarray(block_cr_apply(block_cr_factor(A, B, C), r))
        scale = np.abs(x_ref).max() + 1e-9
        assert np.isfinite(x_cr).all(), nx
        assert np.abs(x_cr - x_ref).max() / scale < 2e-4, nx


def test_engines_agree():
    """Lanes-major engine == per-system blocked engine (tiny problem).

    pivot=True selects the lanes-major engine's full-Newton path — the same
    iteration scheme as the blocked oracle, so results must match even on
    this deliberately under-resolved schedule (the default modified-Newton
    path is validated separately against a converged reference)."""
    m_bl = M.MethanationModel.default(n_conditions=2, nx=11, n_steps=10,
                                      growth=1.6, particle_chunk=4,
                                      pivot=True)
    m_ref = dataclasses.replace(m_bl, engine="blocked")
    theta = jnp.asarray([[13.04, 52.2e3, 1.147e5, 96.7e3, 5.0],
                         [18.0, 54e3, 2e5, 1.0e5, 4.0]], jnp.float32)
    ll_bl, fl_bl = m_bl.log_likelihood(theta)
    ll_rf, fl_rf = m_ref.log_likelihood(theta)
    np.testing.assert_allclose(np.asarray(fl_bl), np.asarray(fl_rf),
                               rtol=1e-3, atol=5e-3)
    np.testing.assert_allclose(np.asarray(ll_bl), np.asarray(ll_rf),
                               rtol=1e-3, atol=0.05)


def test_lagged_jacobian_march_matches_dense():
    """jac_stride>1 (IDA-style factor reuse + BDF predictor + dense tail,
    the batch_last default) agrees with per-step factoring to within the
    discretization error. The lagged march solves the SAME nonlinear BDF
    equations — only the Newton iteration matrix is stale — so converged
    flows must coincide up to the (piecewise-constant-h) schedule change.
    Tolerances calibrated on the flagship sweep (sweep_jac_lag.py): lag-only
    differences there were <=0.05 sccm on well-conditioned draws."""
    m_dense = M.MethanationModel.default(
        n_conditions=3, nx=15, n_steps=20, growth=1.5, particle_chunk=4,
        jac_stride=1, dense_tail=0)
    m_lag = dataclasses.replace(m_dense, jac_stride=4, reuse_iters=2,
                                dense_tail=4)
    theta = jnp.asarray([[13.04, 52.2e3, 1.147e5, 96.7e3, 5.0],
                         [15.0, 52.5e3, 1.5e5, 9.7e4, 4.0],
                         [11.0, 51.9e3, 0.9e5, 9.6e4, 6.0],
                         [13.0, 52.0e3, 2.0e5, 9.8e4, 5.0]], jnp.float32)
    _, fl_d = m_dense.log_likelihood(theta)
    _, fl_l = m_lag.log_likelihood(theta)
    fl_d, fl_l = np.asarray(fl_d), np.asarray(fl_l)
    ok = (fl_d > -9999) & (fl_l > -9999)
    assert ok.mean() > 0.9
    scale = np.abs(fl_d[ok]).max()
    assert np.abs(np.where(ok, fl_d - fl_l, 0.0)).max() < 0.02 * scale


def test_steady_march_matches_long_transient():
    """march="steady" (per-lane SER pseudo-transient continuation,
    ops/dae_fast.steady_march_bl) solves the t->inf state the transient
    march approaches: flows must match a long, dense transient march
    (t_final=150, per-step factoring) on every lane where both engines'
    failure sentinels pass. The reference's observable is the endpoint of
    an IDA integration to tfinal=75 (methanation_set_likelihood.py:191-233)
    — a steady-state read-out; docs/PERF.md records the measured
    speed/accuracy trade (steady is certified-exact but ~13% slower than
    the lagged march, which is why "transient" stays the default)."""
    m_long = M.MethanationModel.default(
        n_conditions=3, nx=15, n_steps=40, growth=1.3, particle_chunk=4,
        jac_stride=1, dense_tail=0, t_final=150.0, newton_iters=3)
    m_sdy = dataclasses.replace(m_long, march="steady")
    theta = jnp.asarray([[13.04, 52.2e3, 1.147e5, 96.7e3, 5.0],
                         [15.0, 52.5e3, 1.5e5, 9.7e4, 4.0],
                         [11.0, 51.9e3, 0.9e5, 9.6e4, 6.0],
                         [13.0, 52.0e3, 2.0e5, 9.8e4, 5.0]], jnp.float32)
    _, fl_t = m_long.log_likelihood(theta)
    _, fl_s = m_sdy.log_likelihood(theta)
    fl_t, fl_s = np.asarray(fl_t), np.asarray(fl_s)
    ok = (fl_t > -9999) & (fl_s > -9999)
    assert ok.mean() > 0.9, "steady convergence certificate failed broadly"
    assert np.abs(np.where(ok, fl_t - fl_s, 0.0)).max() < 2.0  # sccm


def test_conservation_laws(small_model):
    """Outlet elemental balances close: carbon (CO2+CH4), hydrogen, argon."""
    kin = jnp.asarray(M.KIN_TRUE, jnp.float32)
    flows = np.asarray(small_model.simulate_flows(kin))  # (5, n)
    cond = small_model.cond
    F_in = np.asarray(cond.C_in) * np.asarray(cond.u_in)[:, None] \
        * M.AREA * 60 * M.R_GAS * 298 / M.P_STP * 1e6  # (n, 5)
    np.testing.assert_allclose(flows[1] + flows[2], F_in[:, 1], rtol=5e-3)
    np.testing.assert_allclose(flows[4], F_in[:, 4], rtol=5e-3)
    H_out = 2 * flows[0] + 4 * flows[2] + 2 * flows[3]
    np.testing.assert_allclose(H_out, 2 * F_in[:, 0], rtol=5e-3)


def test_true_params_maximize_likelihood(small_model):
    theta_true = jnp.asarray([[13.04, 52.2e3, 1.147e5, 96.7e3, 5.0]],
                             jnp.float32)
    perturbed = jnp.asarray([[13.04, 55e3, 1.147e5, 96.7e3, 5.0],
                             [30.0, 52.2e3, 1.147e5, 96.7e3, 5.0]],
                            jnp.float32)
    ll_t, _ = small_model.log_likelihood(theta_true)
    ll_p, _ = small_model.log_likelihood(perturbed)
    assert (np.asarray(ll_t)[0] > np.asarray(ll_p)).all()


def test_failure_produces_no_nan(small_model):
    """Extreme kinetics must never yield NaN log-lik (the -10000 sentinel /
    -inf masking replaces the reference errorbox,
    methanation_set_likelihood.py:234-254)."""
    crazy = jnp.asarray([[3e2, 1e3, 3e6, 1e3, 14.9],
                         [339.0, 0.0, 3.5e6, 0.0, 0.51]], jnp.float32)
    ll, flows = small_model.log_likelihood(crazy)
    assert not np.isnan(np.asarray(ll)).any()


def test_prior_bounds_match_reference_formula():
    p = M.methanation_prior()
    use = np.asarray(M.KIN_TRUE + (M.SIGMA_TRUE,))
    np.testing.assert_allclose(
        np.asarray(p.low),
        [use[0] - 4 * use[0], use[1] - use[1], use[2] - 4 * use[2],
         use[3] - use[3], use[8] - 0.9 * use[8]], rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(p.high),
        [use[0] + 25 * use[0], use[1] + use[1], use[2] + 30 * use[2],
         use[3] + 2 * use[3], use[8] + 2 * use[8]], rtol=1e-6)


def test_condition_table_deterministic_and_physical():
    c1 = M.make_condition_table(8)
    c2 = M.make_condition_table(8)
    np.testing.assert_array_equal(np.asarray(c1.C_in), np.asarray(c2.C_in))
    assert (np.asarray(c1.T_in) > 273).all()
    assert (np.asarray(c1.u_in) > 0).all()
    assert (np.asarray(c1.C_in)[:, 2:4] == 0).all()  # CH4/H2O-free feed
    # H2 in stoichiometric excess of 4:1
    C = np.asarray(c1.C_in)
    assert (C[:, 0] >= 4.0 * C[:, 1] - 1e-6).all()


@pytest.mark.skipif(not SLOW, reason="set SMC_TPU_SLOW=1 for e2e run")
def test_methanation_posterior_small():
    from smc_tpu import SMCConfig, run_smc
    model = M.MethanationModel.default(n_conditions=2, nx=15, n_steps=20,
                                       growth=1.5, engine="blocked",
                                       particle_chunk=32)
    cfg = SMCConfig(n_particles=32, mh_steps=2, mh_steps_final=4,
                    max_steps=25)
    state = run_smc(model, cfg, jax.random.key(0), verbose=False)
    p = np.asarray(state.particles)
    assert float(state.gamma) == 1.0
    assert np.isfinite(p).all()
    assert 0.5 < p[:, 4].mean() < 15.0


def test_analytic_jacobian_blocks_match_tangents():
    """The closed-form y_p/yd Jacobian blocks equal the jax.linearize
    tangent-built ones at a perturbed state (fp32 roundoff)."""
    import jax as _jax
    model = M.MethanationModel.default(n_conditions=2, nx=11, n_steps=6,
                                       growth=1.6)
    condv = jnp.tile(model._cond_vecs().T, (1, 1))
    flags = M._grid_flags(11).T[:, :, None]
    kin = jnp.tile(jnp.asarray(M.KIN_TRUE, jnp.float32)[:, None], (1, 2))
    y0 = M.initial_guess(model.cond, 11)
    Y = jnp.moveaxis(y0, 0, -1).transpose(1, 0, 2) * 1.03 + 0.01
    Yd = Y * 0.001
    Y_m = jnp.concatenate([Y[:, :1], Y[:, :-1]], axis=1)
    Y_p = jnp.concatenate([Y[:, 1:], Y[:, -1:]], axis=1)

    def rows(y_m, y, y_p, yd):
        return M._rows_bl(y_m, y, y_p, yd, flags, condv, kin)

    _, lin = _jax.linearize(rows, Y_m, Y, Y_p, Yd)
    zeros = jnp.zeros_like(Y)

    def tangent_block(slot):
        cols = []
        for f in range(7):
            tang = [zeros] * 4
            e = jnp.zeros((7, 1, 1)).at[f, 0, 0].set(1.0)
            tang[slot] = jnp.broadcast_to(e, Y.shape)
            cols.append(lin(*tang))
        return jnp.stack(cols, axis=1)

    got = M._analytic_CD_jac(flags, condv)(Y_m, Y, Y_p, Yd)
    for slot in (2, 3):
        ref = np.asarray(tangent_block(slot))
        scale = np.abs(ref).max() + 1e-9
        assert np.abs(np.asarray(got[slot]) - ref).max() / scale < 1e-6

    # Full analytic Jacobian: every slot, every block entry (rate-law
    # partials, density/heat-capacity chain, boundary-row masks).
    got = M._analytic_full_jac(flags, condv, kin)(Y_m, Y, Y_p, Yd)
    for slot in range(4):
        ref = np.asarray(tangent_block(slot))
        err = np.abs(np.asarray(got[slot]) - ref)
        # per-entry relative tolerance against the block's own magnitude
        scale = np.abs(ref).max() + 1e-9
        assert err.max() / scale < 5e-6, (slot, err.max(), scale)
