"""On-TPU Pallas regression smoke: COMPILED kernels vs their jnp forms.

CI pins the Pallas kernels in interpret mode on CPU (tests/test_pallas.py,
test_resample_pallas.py); this script closes the remaining gap (round-2
verdict weak-spot 3): a libtpu/Mosaic change that altered a compiled
kernel's output would surface as a silently wrong posterior, not a test
failure. Run it on the real chip after any toolchain or kernel change:

    setsid python benchmarks/pallas_onchip_smoke.py > /tmp/pl_smoke.out &

Checks (matching the interpret-mode tests' contracts):
  merge     sorted_offsets_to_ancestors == scatter+cumsum, BITWISE (int32),
            over random + degenerate offset patterns and non-tile-multiple N
  ladder    streaming gamma-ladder sums vs (K, N) jnp fp64, rtol 2e-5
  mm_exact  fused Lambert-W likelihood vs jnp closed form, rtol 2e-2 +
            sigma<=0 -> -inf guard
  mm_batch  the custom_vmap batched kernel (ensemble path) vs per-
            population single launches, ~bitwise (same kernel math)

Exits nonzero on any failure; prints one JSON line per check.
"""
import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

FAILED = False


def report(name, ok, detail=""):
    global FAILED
    FAILED |= not ok
    print(json.dumps({"check": name, "ok": bool(ok), "detail": detail}),
          flush=True)


def check_merge():
    from smc_tpu.ops.resample_pallas import _T, _W, sorted_offsets_to_ancestors

    def reference(offsets, n):
        hist = jnp.zeros(n, jnp.int32).at[offsets].add(1, mode="drop")
        return jnp.cumsum(hist) - 1

    worst = 0
    for n in (257, _W, _T, 5000, 3 * _T + 17, 100000):
        rng = np.random.default_rng(n)
        raw = (rng.integers(0, 4, n) * (rng.random(n) < 0.4)).astype(np.int64)
        raw = np.minimum(raw, n)
        raw[np.argmax(raw)] += n - raw.sum()
        counts = jnp.asarray(raw, jnp.int32)
        offsets = jnp.cumsum(counts) - counts
        got = np.asarray(sorted_offsets_to_ancestors(offsets))
        want = np.asarray(reference(offsets, n))
        worst = max(worst, int(np.abs(got - want).max()))
    # degenerate: one survivor takes all slots (first and last)
    for pos in (0, -1):
        n = 4096
        raw = np.zeros(n, np.int64); raw[pos] = n
        counts = jnp.asarray(raw, jnp.int32)
        offsets = jnp.cumsum(counts) - counts
        got = np.asarray(sorted_offsets_to_ancestors(offsets))
        want = np.asarray(reference(offsets, n))
        worst = max(worst, int(np.abs(got - want).max()))
    report("merge_bitwise", worst == 0, f"max int diff {worst}")


def check_ladder():
    from smc_tpu.ops.ladder_pallas import ladder_stats
    rng = np.random.default_rng(3)
    n, k = 100001, 81   # non-tile-multiple N
    d_ll = -np.abs(rng.normal(size=n)).astype(np.float32) * 5.0
    d_ll[::97] = -np.inf
    dg = (0.3 * 0.7 ** np.arange(k)).astype(np.float32)
    s1, s2 = ladder_stats(jnp.asarray(d_ll), jnp.asarray(dg))
    w = np.exp(d_ll[None, :].astype(np.float64) * dg[:, None])
    e1 = np.abs(np.asarray(s1, np.float64) / w.sum(1) - 1.0).max()
    e2 = np.abs(np.asarray(s2, np.float64) / (w * w).sum(1) - 1.0).max()
    report("ladder_vs_jnp", e1 < 2e-5 and e2 < 2e-5,
           f"rel err s1 {e1:.2e} s2 {e2:.2e}")


def check_mm_exact():
    from smc_tpu.models.michaelis_menten import MichaelisMentenModel
    from smc_tpu.ops.mm_pallas import mm_loglik_exact_pallas
    model = MichaelisMentenModel.default(method="exact")
    rng = np.random.default_rng(3)
    theta = jnp.asarray(np.column_stack([
        rng.uniform(0.05, 8.0, 4096), rng.uniform(0.05, 8.0, 4096),
        rng.uniform(0.005, 5.0, 4096)]).astype(np.float32))
    ll_ref, _ = jax.jit(model.log_likelihood)(theta)
    dt = float(np.asarray(model.ts)[1] - np.asarray(model.ts)[0])
    ll_pl = mm_loglik_exact_pallas(theta, model.obs, model.s0, dt)
    a, b = np.asarray(ll_pl, np.float64), np.asarray(ll_ref, np.float64)
    fin = np.isfinite(b)
    err = np.abs(a[fin] - b[fin]) / np.maximum(np.abs(b[fin]), 1.0)
    bad = jnp.asarray([[1.2, 0.5, -1.0], [1.2, 0.5, 0.0],
                       [1.2, 0.5, 0.02]], jnp.float32)
    llb = np.asarray(mm_loglik_exact_pallas(bad, model.obs, model.s0, dt))
    guard = llb[0] == -np.inf and llb[1] == -np.inf and np.isfinite(llb[2])
    report("mm_exact_vs_jnp", err.max() < 2e-2 and bool(guard),
           f"max rel err {err.max():.2e}, sigma guard {guard}")


def check_mm_batched():
    from smc_tpu.models.michaelis_menten import MichaelisMentenModel
    from smc_tpu.ops.mm_pallas import (_exact_pallas_vmappable,
                                       mm_loglik_exact_pallas)
    model = MichaelisMentenModel.default(method="exact")
    dt = float(np.asarray(model.ts)[1] - np.asarray(model.ts)[0])
    rng = np.random.default_rng(5)
    D, N = 8, 2048
    theta = jnp.asarray(rng.uniform(0.05, 6.0, (D, N, 3)).astype(np.float32))
    obs = jnp.asarray(np.asarray(model.obs)[None]
                      + rng.normal(0, 0.02, (D,) + model.obs.shape)
                      .astype(np.float32))
    s0 = jnp.broadcast_to(model.s0, (D,) + model.s0.shape)
    fn = _exact_pallas_vmappable(dt, 2048, 1, False)
    batched = np.asarray(jax.vmap(fn)(theta, obs, s0))
    single = np.stack([np.asarray(mm_loglik_exact_pallas(
        theta[d], obs[d], model.s0, dt)) for d in range(D)])
    fin = np.isfinite(single)
    err = np.abs(batched[fin] - single[fin]).max()
    report("mm_batched_vs_single", err == 0.0 and
           bool((np.isfinite(batched) == fin).all()),
           f"max abs diff {err}")


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    check_merge()
    check_ladder()
    check_mm_exact()
    check_mm_batched()
    print("PALLAS_ONCHIP_" + ("FAIL" if FAILED else "PASS"), flush=True)
    sys.exit(1 if FAILED else 0)
