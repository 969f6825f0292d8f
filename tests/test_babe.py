"""Twisted ("burn-at-both-ends") block-Thomas solver (ops/dae_fast.py).

BABE runs both elimination chains as one lane-stacked half-depth scan
(round-3 verdict item 5: chain depth, not FLOPs, binds the DAE march).
Correctness pins:
- solve parity with the standard block-Thomas on random systems,
  including the flagship's hostile outlet structure (a row-permuted
  identity diagonal block, which the pivoted peeled head steps absorb;
  no-pivot LU would divide by zero there);
- engine-level likelihood parity on the methanation model;
- odd-NX requirement surfaced as a clear error.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smc_tpu.ops.dae_fast import (block_thomas_apply, block_thomas_factor,
                                  block_thomas_babe_apply,
                                  block_thomas_babe_factor)


def _random_system(rng, nx, nf=7, bsz=16, permuted_outlet=True):
    A = rng.standard_normal((nx, nf, nf, bsz)).astype(np.float32)
    C = rng.standard_normal((nx, nf, nf, bsz)).astype(np.float32)
    B = (rng.standard_normal((nx, nf, nf, bsz))
         + 12 * np.eye(nf)[None, :, :, None]).astype(np.float32)
    A[0] = 0.0
    C[-1] = 0.0
    if permuted_outlet:
        # the real outlet BC block: identity with two rows swapped
        P = np.eye(nf, dtype=np.float32)
        P[[5, 6]] = P[[6, 5]]
        B[-1] = np.repeat(P[:, :, None], bsz, axis=2)
    return jnp.asarray(A), jnp.asarray(B), jnp.asarray(C)


@pytest.mark.parametrize("nx", [7, 11, 51])
@pytest.mark.parametrize("permuted_outlet", [False, True])
def test_babe_matches_thomas(nx, permuted_outlet):
    rng = np.random.default_rng(nx)
    A, B, C = _random_system(rng, nx, permuted_outlet=permuted_outlet)
    rhs = jnp.asarray(rng.standard_normal((nx, 7, 16)).astype(np.float32))
    LUs, ms = block_thomas_factor(A, B, C)
    x_ref = np.asarray(block_thomas_apply(LUs, ms, C, rhs))
    fac = block_thomas_babe_factor(A, B, C)
    x = np.asarray(block_thomas_babe_apply(fac, rhs))
    assert np.isfinite(x).all()
    scale = np.abs(x_ref).max()
    np.testing.assert_allclose(x, x_ref, atol=2e-4 * max(scale, 1.0))


def test_babe_factor_reuse_multiple_rhs():
    """Stored factors serve any number of right-hand sides (the
    modified-Newton factor-lag contract)."""
    rng = np.random.default_rng(0)
    A, B, C = _random_system(rng, 11)
    fac = block_thomas_babe_factor(A, B, C)
    LUs, ms = block_thomas_factor(A, B, C)
    for i in range(3):
        rhs = jnp.asarray(
            rng.standard_normal((11, 7, 16)).astype(np.float32))
        x = np.asarray(block_thomas_babe_apply(fac, rhs))
        x_ref = np.asarray(block_thomas_apply(LUs, ms, C, rhs))
        np.testing.assert_allclose(
            x, x_ref, atol=2e-4 * max(np.abs(x_ref).max(), 1.0))


def test_babe_rejects_even_nx():
    rng = np.random.default_rng(1)
    A, B, C = _random_system(rng, 10, permuted_outlet=False)
    with pytest.raises(ValueError, match="odd NX"):
        block_thomas_babe_factor(A, B, C)


def test_babe_engine_likelihood_parity():
    """solver="babe" reproduces the default engine's log-likelihood on the
    methanation model (the production deployment surface)."""
    from smc_tpu.models.methanation import KIN_TRUE, MethanationModel
    m_t = MethanationModel.default(n_conditions=2, nx=11, particle_chunk=8,
                                   solver="thomas")
    m_b = MethanationModel.default(n_conditions=2, nx=11, particle_chunk=8,
                                   solver="babe")
    kin = jnp.asarray(KIN_TRUE, jnp.float32)
    f_t = np.asarray(jax.jit(m_t.simulate_flows)(kin))
    f_b = np.asarray(jax.jit(m_b.simulate_flows)(kin))
    assert (f_t != -10000.0).all()          # solves actually succeeded
    np.testing.assert_allclose(f_b, f_t, atol=1e-3)

    th = m_t.prior.sample(jax.random.key(0), 16)
    ll_t = np.asarray(jax.jit(m_t.log_likelihood)(th)[0])
    ll_b = np.asarray(jax.jit(m_b.log_likelihood)(th)[0])
    np.testing.assert_allclose(ll_b, ll_t,
                               rtol=1e-4, atol=1e-3)


def test_bf16_factor_storage_apply():
    """bf16-stored factors (the _BF16_FACTORS experiment,
    benchmarks/ab_bf16_factors.py) solve the same systems to ~bf16
    relative accuracy — block_thomas_apply casts per-slice inside the
    scan bodies when the factor dtype is narrower than the rhs."""
    rng = np.random.default_rng(3)
    A, B, C = _random_system(rng, 17, permuted_outlet=False)
    rhs = jnp.asarray(rng.standard_normal((17, 7, 16)).astype(np.float32))
    LUs, ms = block_thomas_factor(A, B, C)
    x_ref = np.asarray(block_thomas_apply(LUs, ms, C, rhs))
    x_bf = np.asarray(block_thomas_apply(
        LUs.astype(jnp.bfloat16), ms.astype(jnp.bfloat16),
        C.astype(jnp.bfloat16), rhs))
    assert x_bf.dtype == np.float32
    scale = np.abs(x_ref).max()
    np.testing.assert_allclose(x_bf, x_ref, atol=3e-2 * max(scale, 1.0))


def test_bf16_factor_flag_end_to_end():
    """The trace-time flag wires through the methanation engine: the
    likelihood stays finite and close to the fp32 path on an in-support
    probe (cheap nx to keep CPU compile bounded)."""
    from smc_tpu.models.methanation import MethanationModel
    from smc_tpu.ops import dae_fast

    theta = jnp.tile(jnp.asarray(
        [[13.04, 52.2e3, 1.147e5, 96.7e3, 5.0]], jnp.float32), (8, 1))
    model = MethanationModel.default(n_conditions=4, nx=11,
                                     particle_chunk=8, solver="thomas")
    la = np.asarray(model.log_likelihood(theta)[0])
    dae_fast._BF16_FACTORS = True
    try:
        lb = np.asarray(model.log_likelihood(theta)[0])
    finally:
        dae_fast._BF16_FACTORS = False
    assert np.isfinite(lb).all()
    np.testing.assert_allclose(lb, la, rtol=0, atol=2e-2 * abs(la).max())
