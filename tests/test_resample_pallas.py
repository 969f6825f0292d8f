"""The streaming merge kernel (ops/resample_pallas.py) must be bitwise
equal to the scatter+cumsum ancestor construction for ANY sorted offsets,
including the degenerate shapes resampling actually produces: long
zero-count runs (offsets repeat), a single surviving particle, trailing
zero-count particles (offsets == n), and n not a multiple of the kernel's
tile/chunk sizes."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smc_tpu.ops.resample_pallas import sorted_offsets_to_ancestors, _T, _W
from smc_tpu.smc.kernels import (_rs_counts_offsets, counts_to_ancestors,
                                 residual_systematic_apply)


def _reference(offsets, n):
    hist = jnp.zeros(n, jnp.int32).at[offsets].add(1, mode="drop")
    return jnp.cumsum(hist) - 1


def _offsets_from_counts(counts):
    counts = jnp.asarray(counts, jnp.int32)
    return jnp.cumsum(counts) - counts


@pytest.mark.parametrize("n", [257, _W, _T, 5000, 3 * _T + 17])
def test_matches_scatter_on_random_counts(n):
    rng = np.random.default_rng(n)
    # Random offspring counts summing to n with many zeros.
    alive = rng.random(n) < 0.4
    raw = rng.integers(0, 4, n) * alive
    raw[0] += n - raw.sum() if raw.sum() <= n else 0
    raw = np.minimum(raw, n)
    # repair to sum exactly n
    diff = n - raw.sum()
    raw[np.argmax(raw)] += diff
    assert raw.sum() == n and (raw >= 0).all()
    offsets = _offsets_from_counts(raw)
    got = sorted_offsets_to_ancestors(offsets, interpret=True)
    want = _reference(offsets, n)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    # and the counts_to_ancestors contract
    np.testing.assert_array_equal(
        np.asarray(got), np.asarray(counts_to_ancestors(jnp.asarray(raw))))


@pytest.mark.parametrize("case", ["first_takes_all", "last_takes_all",
                                  "all_ones", "middle_block",
                                  "two_survivors_far_apart"])
def test_degenerate_count_patterns(case):
    n = 2 * _T + 100
    counts = np.zeros(n, np.int64)
    if case == "first_takes_all":
        counts[0] = n
    elif case == "last_takes_all":
        counts[-1] = n
    elif case == "all_ones":
        counts[:] = 1
    elif case == "middle_block":
        counts[n // 2] = n
    else:
        counts[3] = n // 2
        counts[-3] = n - n // 2
    offsets = _offsets_from_counts(counts)
    got = sorted_offsets_to_ancestors(offsets, interpret=True)
    want = _reference(offsets, n)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_matches_real_resampler_offsets():
    """Offsets as produced by the actual residual-systematic kernel."""
    n = _T + 333
    key = jax.random.PRNGKey(7)
    w = jax.random.dirichlet(key, jnp.full(n, 0.05))
    counts, offsets = _rs_counts_offsets(jax.random.PRNGKey(8), w)
    assert int(jnp.sum(counts)) == n
    got = sorted_offsets_to_ancestors(offsets, interpret=True)
    want = _reference(offsets, n)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_small_n_fallback_path():
    """Below MIN_N (off interpret) the scatter path is used — same result."""
    n = 64
    counts = np.zeros(n, np.int64)
    counts[5] = n
    offsets = _offsets_from_counts(counts)
    got = sorted_offsets_to_ancestors(offsets)    # CPU backend -> fallback
    np.testing.assert_array_equal(np.asarray(got),
                                  np.asarray(_reference(offsets, n)))


def test_apply_gather_path_matches_scatter_fill(monkeypatch):
    """residual_systematic_apply's merge+gather TPU path must produce the
    same pytree as the scatter-fill path (forced on CPU via the env knob)."""
    import smc_tpu.smc.kernels as K
    n, d = _T + 50, 3
    key = jax.random.PRNGKey(0)
    w = jax.random.dirichlet(key, jnp.full(n, 0.1))
    parts = jax.random.normal(jax.random.PRNGKey(1), (n, d))
    ll = jax.random.normal(jax.random.PRNGKey(2), (n,))
    kr = jax.random.PRNGKey(3)
    base = residual_systematic_apply(kr, w, (parts, ll))
    monkeypatch.setattr(K, "_use_merge_kernel", lambda n: True)
    monkeypatch.setattr(K, "sorted_offsets_to_ancestors",
                        lambda o: sorted_offsets_to_ancestors(
                            o, interpret=True))
    merged = residual_systematic_apply(kr, w, (parts, ll))
    for a, b in zip(jax.tree.leaves(base), jax.tree.leaves(merged)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
