"""Pallas kernel tests (interpret mode on the CPU test platform)."""
import jax
import jax.numpy as jnp
import numpy as np

from smc_tpu.models.michaelis_menten import MichaelisMentenModel
from smc_tpu.ops.mm_pallas import mm_loglik_pallas


def test_mm_pallas_matches_jnp_rk4():
    model = MichaelisMentenModel.default(method="rk4")
    # Stable-regime particles (Km not tiny): fixed-step RK4 in fp32 is
    # chaotic for stiff (Vmax large, Km ~ 0) draws, where the two
    # implementations legitimately diverge (and both get rejected by SMC).
    rng = np.random.default_rng(0)
    theta = np.column_stack([
        rng.uniform(0.3, 5.0, 256),
        rng.uniform(0.3, 5.0, 256),
        rng.uniform(0.05, 5.0, 256),
    ]).astype(np.float32)
    theta = jnp.asarray(theta)
    ll_ref, _ = model.log_likelihood(theta)
    dt = float(np.asarray(model.ts)[1] - np.asarray(model.ts)[0])
    ll_pl = mm_loglik_pallas(theta, model.obs, model.s0, dt, block=256,
                             interpret=True)
    np.testing.assert_allclose(np.asarray(ll_pl), np.asarray(ll_ref),
                               rtol=2e-4, atol=0.05)


def test_mm_pallas_padding_and_sigma_guard():
    model = MichaelisMentenModel.default(method="rk4")
    dt = float(np.asarray(model.ts)[1] - np.asarray(model.ts)[0])
    theta = jnp.asarray([[1.2, 0.5, 0.02],
                         [1.2, 0.5, -1.0],
                         [1.2, 0.5, 0.0]], jnp.float32)
    # N=3 not a multiple of the block: exercises the pad-and-slice path.
    ll = np.asarray(mm_loglik_pallas(theta, model.obs, model.s0, dt,
                                     block=256, interpret=True))
    assert ll.shape == (3,)
    assert np.isfinite(ll[0])
    assert ll[1] == -np.inf and ll[2] == -np.inf


def test_mm_exact_pallas_matches_jnp_exact():
    """The fused Lambert-W kernel (z-recurrence + rational-init Halley)
    matches the materialized jnp closed form away from the |ln z| > 60
    clip tails (documented deviation in ops/mm_pallas.py)."""
    from smc_tpu.ops.mm_pallas import mm_loglik_exact_pallas
    model = MichaelisMentenModel.default(method="exact")
    rng = np.random.default_rng(3)
    theta = np.column_stack([
        rng.uniform(0.05, 8.0, 512),
        rng.uniform(0.05, 8.0, 512),
        rng.uniform(0.005, 5.0, 512),
    ]).astype(np.float32)
    theta = jnp.asarray(theta)
    ll_ref, _ = model.log_likelihood(theta)
    dt = float(np.asarray(model.ts)[1] - np.asarray(model.ts)[0])
    ll_pl = mm_loglik_exact_pallas(theta, model.obs, model.s0, dt,
                                   block=256, interpret=True)
    np.testing.assert_allclose(np.asarray(ll_pl), np.asarray(ll_ref),
                               rtol=2e-2, atol=0.05)
    # sigma guard + padding path
    bad = jnp.asarray([[1.2, 0.5, -1.0], [1.2, 0.5, 0.0], [1.2, 0.5, 0.02]],
                      jnp.float32)
    llb = np.asarray(mm_loglik_exact_pallas(bad, model.obs, model.s0, dt,
                                            block=256, interpret=True))
    assert llb[0] == -np.inf and llb[1] == -np.inf and np.isfinite(llb[2])


def test_lambertw_fast_initializer_accuracy():
    """The rational (zero-transcendental) initializer + 2 Halley steps is
    fp32-exact over the kernel's whole logz in [-60, 60] domain."""
    from scipy.special import lambertw as slw
    from smc_tpu.ops.mm_pallas import _lambertw_fast
    logz = np.linspace(-60, 60, 5001)
    z = np.exp(logz)
    w = np.asarray(_lambertw_fast(jnp.asarray(z, jnp.float32),
                                  jnp.asarray(logz, jnp.float32)),
                   np.float64)
    ref = slw(z).real
    rel = np.abs(w - ref) / np.maximum(np.abs(ref), 1e-30)
    assert rel.max() < 5e-6


def test_mm_model_pallas_method():
    m = MichaelisMentenModel.default(method="pallas")
    theta = jnp.asarray([[1.2, 0.5, 0.02], [2.0, 1.0, 0.05]], jnp.float32)
    ll, preds = m.log_likelihood(theta)
    m_rk = MichaelisMentenModel.default(method="rk4")
    ll_rk, _ = m_rk.log_likelihood(theta)
    np.testing.assert_allclose(np.asarray(ll), np.asarray(ll_rk), rtol=1e-4,
                               atol=0.05)
    assert preds is None


def test_block_thomas_pallas_matches_scan():
    """Streaming + tiled Pallas block-Thomas applies match the XLA scan
    (interpret mode on CPU), incl. the padded-factor contract the DAE
    march's "thomas_pl" path uses."""
    from smc_tpu.ops.dae_fast import block_thomas_factor, block_thomas_apply
    from smc_tpu.ops.thomas_pallas import (block_thomas_apply_pl,
                                           block_thomas_apply_tiled,
                                           pad_factors)
    rng = np.random.default_rng(0)
    nx, nf, b = 9, 7, 256
    A = rng.normal(size=(nx, nf, nf, b)).astype(np.float32) * 0.3
    B = (rng.normal(size=(nx, nf, nf, b)).astype(np.float32)
         + 4.0 * np.eye(nf)[None, :, :, None].astype(np.float32))
    C = rng.normal(size=(nx, nf, nf, b)).astype(np.float32) * 0.3
    A[0] = 0.0
    C[-1] = 0.0
    r = rng.normal(size=(nx, nf, b)).astype(np.float32)
    A, B, C, r = map(jnp.asarray, (A, B, C, r))
    LUs, ms = block_thomas_factor(A, B, C)
    x_ref = np.asarray(jax.jit(block_thomas_apply)(LUs, ms, C, r))
    scale = np.abs(x_ref).max()
    x_st = np.asarray(block_thomas_apply_pl(*pad_factors(LUs, ms, C), r,
                                            interpret=True))
    np.testing.assert_allclose(x_st / scale, x_ref / scale, atol=2e-5)
    x_ti = np.asarray(block_thomas_apply_tiled(LUs, ms, C, r,
                                               interpret=True))
    np.testing.assert_allclose(x_ti / scale, x_ref / scale, atol=2e-5)
    # Non-TPU backend guard: compiled call falls back to the XLA scan,
    # slicing padded factor rows — bitwise-equal to the reference.
    x_fb = np.asarray(block_thomas_apply_pl(*pad_factors(LUs, ms, C), r))
    assert (x_fb == x_ref).all()


def test_ladder_stats_matches_jnp():
    """Streaming Pallas gamma-ladder sums (interpret mode) match the jnp
    (K, N) formulation — incl. -inf failure sentinels and a non-tile-
    multiple N (padding tail must contribute exactly zero)."""
    from smc_tpu.ops.ladder_pallas import ladder_stats
    rng = np.random.default_rng(3)
    n, k = 9000, 81  # not a multiple of the 8192 tile
    d_ll = -np.abs(rng.normal(size=n)).astype(np.float32) * 5.0
    d_ll[::97] = -np.inf  # failed-particle sentinels
    dg = (0.3 * 0.7 ** np.arange(k)).astype(np.float32)
    s1, s2 = ladder_stats(jnp.asarray(d_ll), jnp.asarray(dg),
                          interpret=True)
    w = np.exp(d_ll[None, :].astype(np.float64) * dg[:, None])
    np.testing.assert_allclose(np.asarray(s1), w.sum(1), rtol=2e-5)
    np.testing.assert_allclose(np.asarray(s2), (w * w).sum(1), rtol=2e-5)


def test_ladder_stats_batched_rule_matches_jnp():
    """The custom_vmap rule the hierarchical ensemble hits on TPU (vmapped
    SMC step -> batched ladder_stats) must reproduce the per-population
    jnp sums. The rule itself is pure XLA, so it runs (and is pinned) on
    any backend even though only TPU dispatch reaches it in production."""
    from smc_tpu.ops.ladder_pallas import (_ladder_stats_jnp,
                                           _ladder_stats_kernel)
    rng = np.random.default_rng(9)
    b, n, k = 5, 1000, 81
    d_ll = -np.abs(rng.normal(size=(b, n))).astype(np.float32) * 4.0
    d_ll[:, ::53] = -np.inf
    dg = (0.3 * 0.7 ** np.arange(k)).astype(np.float32)
    dg_b = np.stack([dg * (1.0 + 0.1 * i) for i in range(b)])
    s1, s2 = jax.vmap(_ladder_stats_kernel)(jnp.asarray(d_ll),
                                            jnp.asarray(dg_b))
    r1, r2 = _ladder_stats_jnp(jnp.asarray(d_ll), jnp.asarray(dg_b))
    np.testing.assert_allclose(np.asarray(s1), np.asarray(r1), rtol=2e-5)
    np.testing.assert_allclose(np.asarray(s2), np.asarray(r2), rtol=2e-5)
    # unbatched dgammas broadcast across the population axis
    s1u, _ = jax.vmap(_ladder_stats_kernel, in_axes=(0, None))(
        jnp.asarray(d_ll), jnp.asarray(dg))
    r1u, _ = _ladder_stats_jnp(jnp.asarray(d_ll), jnp.asarray(dg))
    np.testing.assert_allclose(np.asarray(s1u), np.asarray(r1u), rtol=2e-5)


def test_mm_exact_pallas_batched_matches_unbatched():
    """The batched (multi-population) kernel variant — what the ensemble's
    population vmap lowers to via the custom_vmap rule — must agree with
    per-population unbatched calls, incl. per-population observation sets
    and the padding tail (N not a block multiple)."""
    from smc_tpu.ops.mm_pallas import (_exact_pallas_vmappable,
                                       mm_loglik_exact_pallas)
    model = MichaelisMentenModel.default(method="exact")
    rng = np.random.default_rng(11)
    b, n = 3, 300
    theta = np.column_stack([
        rng.uniform(0.3, 5.0, b * n),
        rng.uniform(0.3, 5.0, b * n),
        rng.uniform(0.05, 5.0, b * n),
    ]).astype(np.float32).reshape(b, n, 3)
    obs = np.stack([np.asarray(model.obs) + 0.02 * rng.normal(
        size=model.obs.shape).astype(np.float32) for _ in range(b)])
    theta, obs = jnp.asarray(theta), jnp.asarray(obs)
    dt = float(np.asarray(model.ts)[1] - np.asarray(model.ts)[0])

    fn = _exact_pallas_vmappable(dt, 2048, 1, True)   # interpret on CPU
    ll_b = jax.vmap(fn, in_axes=(0, 0, None))(theta, obs, model.s0)
    assert ll_b.shape == (b, n)
    for i in range(b):
        ll_i = mm_loglik_exact_pallas(theta[i], obs[i], model.s0, dt,
                                      interpret=True)
        np.testing.assert_allclose(np.asarray(ll_b[i]), np.asarray(ll_i),
                                   rtol=1e-5, atol=1e-3)
