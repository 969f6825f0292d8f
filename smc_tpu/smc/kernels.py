"""Core SMC kernels: adaptive tempering, resampling, RW-MH mutation.

Every kernel here is a pure jittable function with static shapes, designed to
run on a particle axis that may be sharded over a device mesh: all reductions
(max, sum, covariance) are expressed as jnp ops that XLA lowers to psum/pmax
collectives under pjit, and the resampling index build is a cumsum +
searchsorted (parallel prefix-sum + binary gather) instead of the reference's
sequential O(N) Python scan.

Reference behavior (rebuilt, not ported):
- adaptive gamma search: Micmem_SMC_main.py:109-144 /
  SMC_methanation_main.py:205-240 (Algorithm 1 of SMC_Algorithm/algorithm1.png)
- residual-systematic resampling: Micmem_SMC_main.py:146-184
  (Algorithm 2 of SMC_Algorithm/algorithm2.png)
- adaptive random-walk Metropolis mutation: Micmem_SMC_main.py:186-251 /
  SMC_methanation_main.py:282-408
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from smc_tpu.config import SMCConfig
from smc_tpu.ops.ladder_pallas import ladder_stats
from smc_tpu.ops.resample_pallas import (MIN_N as _MERGE_MIN_N,
                                         sorted_offsets_to_ancestors)
from smc_tpu.priors import Prior


def _use_merge_kernel(n: int) -> bool:
    """TPU scatters serialize on the scalar core (~9 cycles/index); above
    MIN_N the streaming merge kernel (ops/resample_pallas.py) builds the
    ancestor ladder with vector compares instead. Patchable in tests."""
    return n >= _MERGE_MIN_N and jax.default_backend() == "tpu"


# --------------------------------------------------------------------------
# Adaptive tempering (gamma search)
# --------------------------------------------------------------------------
class GammaResult(NamedTuple):
    gamma: jnp.ndarray        # () new tempering exponent
    weights: jnp.ndarray      # (N,) normalized incremental importance weights
    ess: jnp.ndarray          # () normalized ESS = 1/(N * sum w^2)
    n_reductions: jnp.ndarray  # () int32 shrink iterations used
    max_log_lik: jnp.ndarray  # ()
    # log((1/N) sum_i exp(dgamma * ll_i)) — this tempering step's increment
    # of the SMC marginal-likelihood (evidence) estimate, computed stably
    # from the pre-normalization weight sum: dgamma*max_ll + log(S/N).
    log_z_inc: jnp.ndarray    # ()


def _ladder_ess(d_ll, gammas, gamma_old, n):
    """Normalized ESS of every ladder candidate: one (K, N) exp + two
    row-reductions (fused by XLA; nothing K*N-sized persists)."""
    w = jnp.exp(d_ll[None, :] * (gammas[:, None] - gamma_old))
    s1 = jnp.sum(w, axis=1)
    s2 = jnp.sum(w * w, axis=1)
    return s1 * s1 / (s2 * n)


def find_gamma(log_lik: jnp.ndarray, gamma_old: jnp.ndarray,
               cfg: SMCConfig) -> GammaResult:
    """ESS-controlled tempering-exponent search.

    Proposes gamma_old + d_gamma_max (clipped to 1), computes normalized
    weights w_i proportional to exp((ll_i - max ll) * (gamma_new - gamma_old))
    and normalized ESS; while ESS <= ess_limit, shrinks the increment by
    gamma_reduction_rate, up to gamma_reduction_iters times
    (Micmem_SMC_main.py:109-144).

    Deviation from the reference: if all shrink iterations are exhausted, the
    returned weights are consistent with the returned gamma (the reference's
    last loop iteration leaves p_weight one shrink staler than gamma_new — a
    latent off-by-one that only triggers when 80 reductions are insufficient,
    i.e. never at the default 0.7^80 ~ 4e-13 increment).
    """
    n = log_lik.shape[0]
    max_ll = jnp.max(log_lik)
    d_ll = log_lik - max_ll  # <= 0; exp() never overflows

    gamma0 = jnp.minimum(gamma_old + cfg.d_gamma_max, 1.0)

    # The candidate ladder gamma_k = gamma_old + (gamma0-gamma_old)*rate^k is
    # fully known up front, so instead of the reference's sequential shrink
    # loop we evaluate the ESS of ALL candidates in one fused (K+1, N) pass
    # (exp + two row-reductions; XLA fuses, nothing big materializes) and
    # select the first k whose ESS clears the limit — identical decisions,
    # no sequential device round-trips.
    ks = jnp.arange(cfg.gamma_reduction_iters + 1)
    gammas = gamma_old + (gamma0 - gamma_old) * (
        cfg.gamma_reduction_rate ** ks.astype(d_ll.dtype))

    n_cand = gammas.shape[0]
    if jax.default_backend() == "tpu":
        # Pallas streaming ladder: one pass over d_ll with VMEM-resident
        # per-candidate accumulators (ops/ladder_pallas.py). The XLA
        # (K, N) fusion below measured 878 us/step at 1e5 (~25x its
        # compute bound — minor-axis row reductions re-materialize the
        # exp lanes); the kernel runs the same sums in ~40 us, constant
        # VMEM at any N, so no chunked fallback is needed.
        s1, s2 = ladder_stats(d_ll, gammas - gamma_old)
        ess_all = (s1 * s1 / (s2 * n)).astype(d_ll.dtype)
        ok = ess_all > cfg.ess_limit
        idx = jnp.where(jnp.any(ok), jnp.argmax(ok), n_cand - 1)
        idx = idx.astype(jnp.int32)
        gamma = gammas[idx]
        weights = jnp.exp(d_ll * (gamma - gamma_old))
        log_z = (gamma - gamma_old) * max_ll + jnp.log(s1[idx] / n)
        weights = weights / jnp.sum(weights)
        return GammaResult(gamma, weights, ess_all[idx], idx, max_ll,
                           log_z.astype(d_ll.dtype))

    if n * n_cand <= (1 << 25):
        # Small-N fast path: all candidates in ONE fused pass — the chunked
        # while_loop's sequential rounds cost more in loop latency than the
        # extra exp lanes at this size (measured ~3.7 ms/step at 1e5, flat
        # in N, i.e. latency- not throughput-bound).
        ess_all = _ladder_ess(d_ll, gammas, gamma_old, n)
        ok = ess_all > cfg.ess_limit
        idx = jnp.where(jnp.any(ok), jnp.argmax(ok), n_cand - 1)
        idx = idx.astype(jnp.int32)
        gamma = gammas[idx]
        weights = jnp.exp(d_ll * (gamma - gamma_old))
        s_w = jnp.sum(weights)
        log_z = (gamma - gamma_old) * max_ll + jnp.log(s_w / n)
        weights = weights / s_w
        return GammaResult(gamma, weights, ess_all[idx], idx, max_ll, log_z)

    # Candidate ladder processed in chunks with early exit: bounds the
    # (chunk, N) working set (no multi-GB intermediate at 10^7+ particles)
    # and stops at the first chunk containing a passing candidate — the
    # common case needs only the first chunk or two.
    chunk = 16
    n_chunks = -(-n_cand // chunk)
    pad = n_chunks * chunk - n_cand
    # pad with the last (smallest-increment) gamma: duplicates never win
    # argmax over 'first passing' because the true candidate precedes them.
    gammas_p = jnp.pad(gammas, (0, pad), mode="edge").reshape(n_chunks,
                                                              chunk)

    def chunk_ess(g_chunk):
        w = jnp.exp(d_ll[None, :] * (g_chunk[:, None] - gamma_old))
        s1 = jnp.sum(w, axis=1)
        s2 = jnp.sum(w * w, axis=1)
        return s1 * s1 / (s2 * n)

    def cond(c):
        i, found_idx, _ = c
        return (i < n_chunks) & (found_idx < 0)

    def body(c):
        i, found_idx, last_ess = c
        ess_c = chunk_ess(gammas_p[i])
        ok_c = ess_c > cfg.ess_limit
        local = jnp.argmax(ok_c)
        found = jnp.where(jnp.any(ok_c), i * chunk + local, -1)
        return i + 1, found, jnp.where(jnp.any(ok_c), ess_c[local],
                                       ess_c[-1])

    _, found_idx, ess_sel = lax.while_loop(
        cond, body, (jnp.zeros((), jnp.int32), jnp.int32(-1),
                     jnp.zeros((), d_ll.dtype)))
    idx = jnp.where(found_idx >= 0, found_idx, ks[-1]).astype(jnp.int32)
    gamma = gammas[idx]
    weights = jnp.exp(d_ll * (gamma - gamma_old))
    s_w = jnp.sum(weights)
    log_z = (gamma - gamma_old) * max_ll + jnp.log(s_w / n)
    weights = weights / s_w
    return GammaResult(gamma, weights, ess_sel, idx, max_ll, log_z)


# --------------------------------------------------------------------------
# Residual-systematic resampling
# --------------------------------------------------------------------------
# The residual cumsum is done in EXACT integer arithmetic: residuals are
# quantized to 2^-QBITS (near-lossless — every fp32 in [0.5, 1) is already a
# multiple of 2^-24) and split into chunks small enough that an int32 cumsum
# cannot overflow at the given N. Integer addition is associative, so the
# counts are bit-identical for ANY summation layout — the sharded
# (parallel/resample_shmap.py) and single-chip kernels agree bitwise at any
# particle count, and there is none of the fp32 cumsum drift that would
# otherwise mis-place O(sqrt(N)) counts at N >~ 2^24.
_QBITS = 24


def _chunk_bits(n: int) -> Tuple[int, int]:
    """(bits per chunk, number of chunks) such that an int32 cumsum of
    n chunk values stays below 2^30 — headroom for the v0 bias add."""
    cb = 30 - max(1, (n - 1).bit_length())
    cb = max(1, min(cb, _QBITS))
    return cb, -(-_QBITS // cb)


def _residual_pieces(resid: jnp.ndarray, n: int):
    """Quantize residuals in [0, 1) to integers q = floor(resid * 2^QBITS)
    (exact fp32 ops) and split q into int32-cumsum-safe chunks."""
    cb, nchunks = _chunk_bits(n)
    q = jnp.floor(resid * (1 << _QBITS)).astype(jnp.int32)
    return [(q >> (i * cb)) & ((1 << cb) - 1) for i in range(nchunks)], cb


def _grid_from_pieces(csum_pieces, cb: int, v0q: jnp.ndarray) -> jnp.ndarray:
    """#grid points {v0 + k, k >= 0} at or below the value encoded by the
    chunked cumsum: max(floor((value - v0q) / 2^QBITS) + 1, 0), evaluated as
    (value + 2^QBITS - v0q) >> QBITS in pure int32 ops (carry-normalize the
    chunks, then collect the bits above QBITS)."""
    nchunks = len(csum_pieces)
    bias = (1 << _QBITS) - v0q                       # in [1, 2^QBITS]
    pieces = list(csum_pieces)
    for i in range(nchunks):
        b = bias >> (i * cb)
        if i < nchunks - 1:
            b = b & ((1 << cb) - 1)
        pieces[i] = pieces[i] + b
    for i in range(nchunks - 1):                     # carry-normalize
        carry = pieces[i] >> cb
        pieces[i] = pieces[i] & ((1 << cb) - 1)
        pieces[i + 1] = pieces[i + 1] + carry
    t = jnp.zeros_like(pieces[0])
    for i in range(nchunks):                         # value >> QBITS
        s = i * cb - _QBITS
        if s >= 0:
            t = t + (pieces[i] << s)
        elif i == nchunks - 1 or s + cb > 0:
            # the top chunk is unmasked — it carries ALL remaining high bits
            t = t + (pieces[i] >> (-s))
    return t


def _rs_counts_offsets(key: jax.Array, weights: jnp.ndarray):
    """Shared core of residual-systematic resampling: per-particle offspring
    counts AND their exclusive prefix sum (output slot offsets), computed
    with a single batched int32 cumsum.

    Two fusions over the naive formulation (measured: the resampling step is
    prefix-sum-launch-bound, docs/PERF.md):
    - the residual piece cumsums and the deterministic-copy cumsum stack
      into ONE (nchunks+1, N) cumsum along the lane axis;
    - the slot offsets telescope analytically — the exclusive cumsum of
      counts_j = det_j + grid_below_j - prev_j is
      (det_csum_j - det_j) + (prev_j - grid_start) because the grid terms
      collapse (prev_i = grid_below_{i-1}) — so no cumsum over counts is
      ever taken.

    The total-count repair (quantization remainder -> max-weight particle)
    is folded into both: identical counts to repair-then-clamp, with the
    offset shift applied positionally.
    """
    n = weights.shape[0]
    scaled = weights * n
    det = jnp.floor(scaled)
    resid = scaled - det          # in [0, 1) per particle, exact fp32
    v0 = jax.random.uniform(key, ())  # == N * wrand, wrand ~ U[0, 1/N)
    v0q = jnp.floor(v0 * (1 << _QBITS)).astype(jnp.int32)

    pieces, cb = _residual_pieces(resid, n)
    det_i = det.astype(jnp.int32)     # values < n, cumsum <= n: int32-exact
    stacked = jnp.stack(pieces + [det_i])
    csum = jnp.cumsum(stacked, axis=1)
    csum_pieces = [csum[i] for i in range(len(pieces))]
    det_csum = csum[len(pieces)]
    grid_below = _grid_from_pieces(csum_pieces, cb, v0q)
    zero = [jnp.zeros((1,), jnp.int32)] * len(csum_pieces)
    grid_start = _grid_from_pieces(zero, cb, v0q)    # (1,) grid at cumsum 0
    prev = jnp.concatenate([grid_start, grid_below[:-1]])
    counts = det_i + grid_below - prev
    # Residual quantization (and fp32 error in the weights themselves) can
    # leave the total one or two off N; repair on the max-weight particle so
    # the total is exactly N (branchless; deterministic, layout-independent).
    # max(diff, -counts[fix]) never drives the count negative — elementwise
    # identical to the historical add-then-clamp (other counts are provably
    # >= 0: det >= 0 and grid_below is nondecreasing).
    total = det_csum[-1] + grid_below[-1] - grid_start[0]
    fix = jnp.argmax(weights)
    applied = jnp.maximum(n - total, -counts[fix])
    counts = counts.at[fix].add(applied)
    offsets = (det_csum - det_i) + (prev - grid_start[0])
    offsets = offsets + jnp.where(jnp.arange(n) > fix, applied, 0)
    return counts, offsets


def residual_systematic_counts(key: jax.Array, weights: jnp.ndarray,
                               ) -> jnp.ndarray:
    """Per-particle offspring counts of residual-systematic resampling.

    Vectorization of Algorithm 2 (SMC_Algorithm/algorithm2.png; sequential
    form at Micmem_SMC_main.py:146-184): deterministic copies
    floor(N*w_i); the residual mass is resampled systematically with a single
    shared uniform draw. The sequential residual sweep

        for j: sum += r_j; if sum >= wrand: count_j += 1; wrand += 1/N

    is equivalent (scaled by N) to counting the grid points {v0 + k, k>=0},
    v0 ~ U(0,1), that fall into each interval of the residual-cumsum — an
    inclusive prefix sum followed by two floors. Fully parallel; cross-shard
    it is a single prefix-sum collective on an (N,) vector. The prefix sum
    runs in exact chunked-int32 arithmetic (see _QBITS note above), so the
    result is layout-independent and drift-free at any N.

    Returns integer counts (N,) summing exactly to N.
    """
    counts, _ = _rs_counts_offsets(key, weights)
    return counts


def residual_systematic_ancestors(key: jax.Array, weights: jnp.ndarray
                                  ) -> jnp.ndarray:
    """Fused counts -> ancestor-index build for the default scheme: reuses
    the analytically-telescoped slot offsets from _rs_counts_offsets, so the
    whole index build costs two cumsum launches (one batched) + one scatter
    instead of five cumsums. Output identical to
    counts_to_ancestors(residual_systematic_counts(...))."""
    n = weights.shape[0]
    _, offsets = _rs_counts_offsets(key, weights)
    if _use_merge_kernel(n):
        return sorted_offsets_to_ancestors(offsets)
    hist = jnp.zeros(n, jnp.int32).at[offsets].add(1, mode="drop")
    return jnp.cumsum(hist) - 1


def residual_systematic_apply(key: jax.Array, weights: jnp.ndarray,
                              arrays):
    """Resample a pytree of (N, ...) float32 arrays by residual-systematic
    ancestors WITHOUT building ancestor indices or gathering.

    Ancestors of this scheme are sorted (all copies of particle j are
    contiguous, in j order), so the permutation out[s] = v[anc[s]] is a
    forward fill from each particle's first output slot — computable as a
    scatter + prefix sum instead of a gather (TPU gathers over a long
    particle axis are latency-heavy; docs/PERF.md measures them at ~ms,
    flat in N):

        dv_j   = int32(v_j) - int32(v_{j-1})     (bitcast, wraparound)
        s      = zeros.at[offsets].add(dv)       (duplicates stack)
        out    = bitcast_back(cumsum(s))         (telescopes to v[anc])

    Integer addition wraps mod 2^32, so the telescoped partial sums
    reconstruct each v bit-exactly regardless of intermediate overflow —
    the output is BITWISE identical to jnp.take(v, ancestors, axis=0)
    (pinned by tests/test_kernels.py). All columns of all arrays share one
    scatter and one batched cumsum.
    """
    leaves, treedef = jax.tree.flatten(arrays)
    n = weights.shape[0]
    cols = []
    shapes = []
    for v in leaves:
        if v.dtype != jnp.float32:
            raise TypeError(f"residual_systematic_apply: float32 only, "
                            f"got {v.dtype}")
        shapes.append(v.shape)
        cols.append(jax.lax.bitcast_convert_type(
            v.reshape(n, -1), jnp.int32))
    bundle = jnp.concatenate(cols, axis=1).T          # (K, N), lanes on N
    _, offsets = _rs_counts_offsets(key, weights)
    if _use_merge_kernel(n):
        # Merge kernel builds the (sorted) ancestors without any scatter;
        # the permutation is then ONE sorted lane-axis gather of the whole
        # bundle (258 us at 1e5 vs the scatter's 897 — micro_permute.py).
        anc = sorted_offsets_to_ancestors(offsets)
        out = jnp.take(bundle, anc, axis=1, indices_are_sorted=True).T
    else:
        dv = jnp.concatenate([bundle[:, :1],
                              bundle[:, 1:] - bundle[:, :-1]], axis=1)
        filled = jnp.zeros_like(bundle).at[:, offsets].add(
            dv, mode="drop", indices_are_sorted=True)
        out = jnp.cumsum(filled, axis=1).T            # (N, K)
    res = []
    k0 = 0
    for shape in shapes:
        k = 1
        for s in shape[1:]:
            k *= s
        res.append(jax.lax.bitcast_convert_type(
            out[:, k0:k0 + k], jnp.float32).reshape(shape))
        k0 += k
    return jax.tree.unflatten(treedef, res)


def counts_to_ancestors(counts: jnp.ndarray) -> jnp.ndarray:
    """Offspring counts (N,) -> ancestor index per output slot (N,).

    Slot layout matches the reference's in-order copy loop
    (Micmem_SMC_main.py:178-184): all copies of particle j are contiguous,
    ordered by j. Built as scatter + prefix-sum: ancestor[n] =
    max{j : offset_j <= n} = cumsum(one-hot at offsets) - 1, where offsets
    is the exclusive cumsum of counts. (A searchsorted formulation costs
    log N gather rounds on TPU — ~10x slower than one scatter + one cumsum;
    this is the hot kernel of the resampling step.)
    """
    n = counts.shape[0]
    offsets = jnp.cumsum(counts) - counts  # exclusive prefix sum
    if _use_merge_kernel(n):
        return sorted_offsets_to_ancestors(offsets)
    hist = jnp.zeros(n, jnp.int32).at[offsets].add(1, mode="drop")
    return jnp.cumsum(hist) - 1


def systematic_counts(key: jax.Array, weights: jnp.ndarray) -> jnp.ndarray:
    """Plain systematic resampling: counts = #{k : v0 + k in (N C_{j-1},
    N C_j]}, one shared uniform draw. (Variant; the reference uses the
    residual form.)"""
    n = weights.shape[0]
    v0 = jax.random.uniform(key, ())
    csum = jnp.cumsum(weights) * n
    below = jnp.maximum(jnp.floor(csum - v0) + 1.0, 0.0)
    counts = jnp.diff(below, prepend=0.0).astype(jnp.int32)
    diff = n - jnp.sum(counts)
    counts = counts.at[jnp.argmax(weights)].add(diff)
    return jnp.maximum(counts, 0)


def stratified_counts(key: jax.Array, weights: jnp.ndarray) -> jnp.ndarray:
    """Stratified resampling: one uniform per output slot within its 1/N
    stratum. (Variant.)"""
    n = weights.shape[0]
    u = (jnp.arange(n) + jax.random.uniform(key, (n,))) / n
    ends = jnp.cumsum(weights)
    # counts_j = #{slots with u in (C_{j-1}, C_j]} via the same
    # scatter-free construction: position of each slot's ancestor.
    anc = jnp.searchsorted(ends, u, side="left").astype(jnp.int32)
    anc = jnp.minimum(anc, n - 1)
    return jnp.zeros(n, jnp.int32).at[anc].add(1)


def multinomial_counts(key: jax.Array, weights: jnp.ndarray) -> jnp.ndarray:
    """Multinomial resampling (iid ancestors). (Variant; highest variance.)"""
    n = weights.shape[0]
    u = jax.random.uniform(key, (n,))
    ends = jnp.cumsum(weights)
    anc = jnp.minimum(jnp.searchsorted(ends, u, side="left"),
                      n - 1).astype(jnp.int32)
    return jnp.zeros(n, jnp.int32).at[anc].add(1)


_RESAMPLERS = {
    "residual_systematic": residual_systematic_counts,
    "systematic": systematic_counts,
    "stratified": stratified_counts,
    "multinomial": multinomial_counts,
}


def resample_counts(key: jax.Array, weights: jnp.ndarray,
                    scheme: str = "residual_systematic") -> jnp.ndarray:
    try:
        fn = _RESAMPLERS[scheme]
    except KeyError:
        raise ValueError(f"unknown resampling scheme {scheme!r}; "
                         f"one of {sorted(_RESAMPLERS)}")
    return fn(key, weights)


def residual_systematic_resample(key: jax.Array, weights: jnp.ndarray,
                                 scheme: str = "residual_systematic"
                                 ) -> jnp.ndarray:
    """Ancestor indices (N,) for the chosen resampling scheme (default:
    the reference's residual-systematic, Algorithm 2)."""
    if scheme == "residual_systematic":
        return residual_systematic_ancestors(key, weights)
    counts = resample_counts(key, weights, scheme)
    return counts_to_ancestors(counts)


# --------------------------------------------------------------------------
# Adaptive random-walk Metropolis mutation
# --------------------------------------------------------------------------
class MutationResult(NamedTuple):
    particles: jnp.ndarray
    log_lik: jnp.ndarray
    n_steps: jnp.ndarray    # () int32 sweeps executed
    accepted: jnp.ndarray   # () number of particles that accepted >= once
    mh_ratio: jnp.ndarray   # () final proposal step ratio


def _weighted_cov(x: jnp.ndarray, cov_weight: jnp.ndarray,
                  eps: float = 1e-10) -> jnp.ndarray:
    """Biased empirical covariance (np.cov(bias=True)) times the elementwise
    cov_weight matrix, plus a relative jitter for Cholesky stability.

    The (N,d)x(d,N) contraction is MXU work and reduces over the (sharded)
    particle axis — XLA inserts the psum.
    """
    n = x.shape[0]
    mu = jnp.mean(x, axis=0)
    xc = x - mu
    cov = (xc.T @ xc) / n
    cov = cov * cov_weight
    d = cov.shape[0]
    jitter = eps * (1.0 + jnp.trace(cov) / d)
    return cov + jitter * jnp.eye(d, dtype=cov.dtype)


class MutationCarry(NamedTuple):
    """Cross-sweep state of an adaptive mutation loop.

    One structure serves both execution granularities: the fused kernels
    (:func:`mh_mutation` & co.) thread it through a ``lax.while_loop``,
    and the driver's sweep-granularity mode (``run_smc(granularity=
    "sweep")``) threads it through one bounded device execution per sweep
    — same traced sweep body either way (:func:`make_mutation_sweeper`).
    """
    j: jnp.ndarray          # () int32 sweeps executed so far
    key: jax.Array          # PRNG key (split per sweep)
    particles: jnp.ndarray  # (N, d) current particles
    log_lik: jnp.ndarray    # (N,) their log-likelihoods
    log_prior: jnp.ndarray  # (N,) their log prior densities
    grad: jnp.ndarray       # (N, d) likelihood gradients (scalar 0 for rwm)
    r_ac: jnp.ndarray       # (N,) bool accepted-at-least-once
    mh_ratio: jnp.ndarray   # () proposal step ratio (halved when stalled)
    done: jnp.ndarray       # () bool early-stop latch


def _make_ll_and_grad(loglik_fn):
    """Per-particle value+gradient of the log-likelihood via ONE VJP.

    Rows are independent, so grad of the per-row sum is every particle's
    own gradient. -inf rows get a zero cotangent and non-finite gradients
    are sanitized to 0: diverged trajectories fall back to gradient-free
    proposals and stay subject to the exact accept test (failures cost
    mixing, never correctness — the -inf/never-NaN invariant holds).
    """
    def ll_and_grad(th):
        def s(t):
            ll, _ = loglik_fn(t)
            return jnp.sum(jnp.where(jnp.isfinite(ll), ll, 0.0)), ll
        g, ll = jax.grad(s, has_aux=True)(th)
        return ll, jnp.where(jnp.isfinite(g), g, 0.0)
    return ll_and_grad


def make_mutation_parts(kind: str, loglik_fn, prior: Prior,
                        cfg: SMCConfig):
    """Split one adaptive mutation sweep at its parallel-decomposition seam.

    Returns ``(init_fn, draw_fn, core_fn, admin_fn, grad_fn)``:

    - ``init_fn(key, particles, log_lik, g0=None) -> MutationCarry`` —
      costs zero likelihood evaluations for ``"rwm"``; for ``"mala"``/
      ``"hmc"`` it computes the initial gradient (one forward+VJP) unless
      a precomputed ``g0`` is passed (the block-granularity driver
      computes it in bounded pieces via ``grad_fn``).
    - ``draw_fn(carry) -> (key, aux_global, aux_rows)`` — the sweep's
      global quantities (empirical-covariance preconditioner factors,
      recomputed every sweep per Micmem_SMC_main.py:308-311) and its
      full-N randomness (proposal noise ``z``, accept draws ``log_u``).
      Zero likelihood evaluations.
    - ``core_fn(parts, lk1, lp1, g1, ratio, aux_global, aux_rows, gamma)
      -> (parts, lk1, lp1, g1, accept)`` — propose / evaluate / accept.
      Every output row depends only on its own input row plus
      ``aux_global``, so the core can run on any contiguous particle
      block with sliced ``aux_rows`` and produce results identical to the
      full-N evaluation (granularity="block" relies on this).
    - ``admin_fn(carry, key, parts, lk1, lp1, g1, accept, gamma)`` —
      fold a completed sweep into the carry: accepted-at-least-once set,
      early stop past the gamma-dependent threshold, step-ratio halving
      below the floor (Micmem_SMC_main.py:236-251). Needs the full-N
      accept vector (the thresholds are global counts).
    - ``grad_fn(particles) -> (N, d) likelihood gradients`` (None for
      ``"rwm"``) — for block-granularity initialization.
    """
    ll_and_grad = _make_ll_and_grad(loglik_fn)
    grad_based = kind in ("mala", "hmc")

    def init_fn(key, particles, log_lik, g0=None):
        n = particles.shape[0]
        if grad_based:
            if g0 is None:
                _, g0 = ll_and_grad(particles)
        else:
            g0 = jnp.zeros((), particles.dtype)
        return MutationCarry(
            j=jnp.zeros((), jnp.int32), key=key, particles=particles,
            log_lik=log_lik, log_prior=prior.log_pdf(particles), grad=g0,
            r_ac=jnp.zeros((n,), bool),
            mh_ratio=jnp.ones((), particles.dtype),
            done=jnp.zeros((), bool))

    def admin_fn(c, key, parts, lk1, lp1, g1, accept, gamma):
        n = parts.shape[0]
        r_th = jnp.where(gamma >= 1.0, cfg.accept_threshold_final,
                         cfg.accept_threshold)
        r_ac = c.r_ac | accept
        acc_sum = jnp.sum(r_ac)
        done = acc_sum > r_th * n
        ratio = jnp.where(~done & (acc_sum < cfg.accept_threshold_min * n),
                          c.mh_ratio * cfg.mh_ratio_decay, c.mh_ratio)
        return MutationCarry(c.j + 1, key, parts, lk1, lp1, g1, r_ac,
                             ratio, done)

    def _chol_and_draws(c):
        """Per-sweep preconditioner + randomness shared by all kinds."""
        n, d = c.particles.shape
        cov_weight = cfg.cov_weight(d).astype(c.particles.dtype)
        key, k_z, k_u = jax.random.split(c.key, 3)
        cov = _weighted_cov(c.particles, cov_weight)
        chol = jnp.linalg.cholesky(cov)
        z = jax.random.normal(k_z, (n, d), dtype=c.particles.dtype)
        log_u = jnp.log(jax.random.uniform(k_u, (n,),
                                           dtype=c.particles.dtype))
        return key, cov, chol, (z, log_u)

    if kind == "rwm":
        def draw_fn(c):
            key, _, chol, rows = _chol_and_draws(c)
            return key, (chol,), rows

        def core_fn(parts, lk1, lp1, g1, ratio, aux_g, aux_r, gamma):
            (chol,) = aux_g
            z, log_u = aux_r
            prop = parts + (z @ chol.T) * ratio

            in_sup = prior.in_support(prop)
            # Evaluate the clipped proposal (reference evaluates the
            # replaced particle too; replaced rows are a numerical no-op
            # but keep shapes static).
            prop_eval = jnp.where(in_sup[:, None], prop, parts)
            lk2, _ = loglik_fn(prop_eval)
            lp2 = prior.log_pdf(prop_eval)

            log_acc = (lk2 - lk1) * gamma + (lp2 - lp1)
            accept = in_sup & (log_acc >= log_u) & jnp.isfinite(lk2)

            parts = jnp.where(accept[:, None], prop_eval, parts)
            lk1 = jnp.where(accept, lk2, lk1)
            lp1 = jnp.where(accept, lp2, lp1)
            return parts, lk1, lp1, g1, accept

    elif kind == "mala":
        def draw_fn(c):
            d = c.particles.shape[1]
            key, cov, chol, rows = _chol_and_draws(c)
            # L^{-1} once per sweep on the tiny (d,d); the per-particle
            # solve is then a plain (d,d)@(d,N) matmul (no large-batch LU
            # custom call — see CLAUDE.md hazard).
            linv = jax.scipy.linalg.solve_triangular(
                chol, jnp.eye(d, dtype=c.particles.dtype), lower=True)
            return key, (cov, chol, linv), rows

        def core_fn(parts, lk1, lp1, g1, ratio, aux_g, aux_r, gamma):
            cov, chol, linv = aux_g
            z, log_u = aux_r
            half_e2 = 0.5 * ratio * ratio * gamma
            prop = parts + half_e2 * (g1 @ cov) + (z @ chol.T) * ratio

            in_sup = prior.in_support(prop)
            prop_eval = jnp.where(in_sup[:, None], prop, parts)
            lk2, g2 = ll_and_grad(prop_eval)
            lp2 = prior.log_pdf(prop_eval)

            # reverse-move residual and its whitened norm
            u = parts - prop_eval - half_e2 * (g2 @ cov)
            v = linv @ u.T                              # (d, N)
            log_q_rev = -0.5 * jnp.sum(v * v, axis=0) / (ratio * ratio)
            log_q_fwd = -0.5 * jnp.sum(z * z, axis=1)

            log_acc = ((lk2 - lk1) * gamma + (lp2 - lp1)
                       + log_q_rev - log_q_fwd)
            accept = in_sup & (log_acc >= log_u) & jnp.isfinite(lk2)

            parts = jnp.where(accept[:, None], prop_eval, parts)
            lk1 = jnp.where(accept, lk2, lk1)
            lp1 = jnp.where(accept, lp2, lp1)
            g1 = jnp.where(accept[:, None], g2, g1)
            return parts, lk1, lp1, g1, accept

    elif kind == "hmc":
        n_leap = cfg.hmc_leapfrog

        def draw_fn(c):
            key, _, chol, rows = _chol_and_draws(c)
            return key, (chol,), rows

        def core_fn(parts, lk1, lp1, g1, eps, aux_g, aux_r, gamma):
            (chol,) = aux_g
            z, log_u = aux_r

            # leapfrog: half kick, (n_leap-1) x (drift + full kick),
            # drift + half kick. lax.scan body = one likelihood + one VJP.
            p = z + 0.5 * eps * gamma * (g1 @ chol)

            def leap(carry, k):
                th, p, lk, g = carry
                th = th + eps * (p @ chol.T)
                lk, g = ll_and_grad(th)
                kick = gamma * (g @ chol)
                w = jnp.where(k < n_leap - 1, 1.0, 0.5).astype(parts.dtype)
                p = p + w * eps * kick
                return (th, p, lk, g), None

            (prop, p_end, lk2, g2), _ = lax.scan(
                leap, (parts, p, lk1, g1), jnp.arange(n_leap))

            in_sup = prior.in_support(prop)
            lp2 = prior.log_pdf(prop)

            log_acc = ((lk2 - lk1) * gamma + (lp2 - lp1)
                       - 0.5 * (jnp.sum(p_end * p_end, axis=1)
                                - jnp.sum(z * z, axis=1)))
            accept = (in_sup & (log_acc >= log_u) & jnp.isfinite(lk2)
                      & jnp.isfinite(prop).all(axis=1))

            parts = jnp.where(accept[:, None], prop, parts)
            lk1 = jnp.where(accept, lk2, lk1)
            lp1 = jnp.where(accept, lp2, lp1)
            g1 = jnp.where(accept[:, None], g2, g1)
            return parts, lk1, lp1, g1, accept

    else:
        raise ValueError(f"unknown mutation kind {kind!r}")

    grad_fn = (lambda p: ll_and_grad(p)[1]) if grad_based else None
    return init_fn, draw_fn, core_fn, admin_fn, grad_fn


def make_mutation_sweeper(kind: str, loglik_fn, prior: Prior,
                          cfg: SMCConfig):
    """Build ``(init_fn, sweep_fn)`` for one adaptive mutation sweep.

    - ``init_fn(key, particles, log_lik) -> MutationCarry`` — costs zero
      likelihood evaluations for ``"rwm"``, one forward+VJP for
      ``"mala"``/``"hmc"`` (the initial gradient).
    - ``sweep_fn(carry, gamma) -> MutationCarry`` — ONE sweep: proposal,
      ``cfg.evals_per_sweep`` likelihood evaluation(s), accept/update,
      early-stop/step-halving bookkeeping. ``gamma`` is a traced operand
      so one compiled sweep serves every tempering step.

    The fused kernels run ``sweep_fn`` under ``lax.while_loop``
    (:func:`_run_sweeps`); the driver's sweep-granularity mode jits it
    standalone so no single device execution exceeds one sweep — the
    bounded-execution requirement of the single-chip tunnel at huge N
    (a >~100 s execution kills the TPU worker; docs/PERF.md). Composed
    from :func:`make_mutation_parts`, so all three execution
    granularities (fused / sweep / block) run the identical math and
    PRNG stream by construction.
    """
    init_fn, draw_fn, core_fn, admin_fn, _ = make_mutation_parts(
        kind, loglik_fn, prior, cfg)

    def sweep_fn(c, gamma):
        key, aux_g, aux_r = draw_fn(c)
        parts, lk1, lp1, g1, accept = core_fn(
            c.particles, c.log_lik, c.log_prior, c.grad, c.mh_ratio,
            aux_g, aux_r, gamma)
        return admin_fn(c, key, parts, lk1, lp1, g1, accept, gamma)

    return init_fn, sweep_fn


def _run_sweeps(kind: str, key, particles, log_lik, gamma, loglik_fn,
                prior: Prior, cfg: SMCConfig) -> MutationResult:
    """Fused adaptive sweep loop: ONE lax.while_loop with a data-dependent
    bound (nMH and the early-stop threshold switch at gamma == 1,
    5 -> 20 and 0.5 -> 0.7 by default — both traced)."""
    init_fn, sweep_fn = make_mutation_sweeper(kind, loglik_fn, prior, cfg)
    final = gamma >= 1.0
    n_mh = jnp.where(final, cfg.mh_steps_final,
                     cfg.mh_steps).astype(jnp.int32)

    def cond(c):
        return (c.j < n_mh) & ~c.done

    def body(c):
        return sweep_fn(c, gamma)

    c = lax.while_loop(cond, body, init_fn(key, particles, log_lik))
    return MutationResult(c.particles, c.log_lik, c.j, jnp.sum(c.r_ac),
                          c.mh_ratio)


def mh_mutation(key: jax.Array,
                particles: jnp.ndarray,
                log_lik: jnp.ndarray,
                gamma: jnp.ndarray,
                loglik_fn: Callable[[jnp.ndarray], Tuple[jnp.ndarray, object]],
                prior: Prior,
                cfg: SMCConfig) -> MutationResult:
    """Adaptive random-walk Metropolis mutation sweep loop.

    Per sweep (Micmem_SMC_main.py:209-249):
    - proposal covariance = empirical particle covariance (bias=True), scaled
      elementwise by cfg.cov_weight (w_cov), recomputed EVERY sweep;
    - proposal = particles + MVN(0, cov) * mh_ratio (via Cholesky);
    - out-of-support proposals are replaced by the current particle before
      likelihood evaluation (support clip, ``p0`` mask);
    - accept iff exp((lk2-lk1)*gamma) * prior_ratio >= U(0,1), done in log
      space here (overflow-free);
    - DELIBERATE DEVIATION: the prior-density ratio (lp2 - lp1) is included
      in the acceptance. The reference omits it (Micmem_SMC_main.py:233 uses
      only exp((lk2-lk1)*gamma) times the support mask), which is correct
      for uniform priors (constant density on the support) but targets the
      wrong invariant distribution for its "normal"/"taylor" prior modes.
      Here the kernel is the statistically correct tempered-posterior
      kernel for ANY prior; identical decisions to the reference whenever
      the prior is uniform. Pinned by
      tests/test_posterior_parity.py::test_normal_prior_posterior_is_statistically_correct;
    - r_ac tracks "accepted at least once"; early-stop when
      sum(r_ac) > r_th*N; halve mh_ratio when sum(r_ac) < r_min*N.

    The number of sweeps and the early-stop threshold switch at gamma == 1
    (nMH 5 -> 20, r_th 0.5 -> 0.7); both are traced values so the whole loop
    is one lax.while_loop with a data-dependent bound.
    """
    return _run_sweeps("rwm", key, particles, log_lik, gamma, loglik_fn,
                       prior, cfg)


# --------------------------------------------------------------------------
# Preconditioned MALA mutation (gradient-based; beyond-reference capability)
# --------------------------------------------------------------------------
def mala_mutation(key: jax.Array,
                  particles: jnp.ndarray,
                  log_lik: jnp.ndarray,
                  gamma: jnp.ndarray,
                  loglik_fn: Callable[[jnp.ndarray],
                                      Tuple[jnp.ndarray, object]],
                  prior: Prior,
                  cfg: SMCConfig) -> MutationResult:
    """Preconditioned Metropolis-adjusted Langevin mutation sweeps.

    Same adaptive scaffolding as :func:`mh_mutation` (per-sweep empirical
    covariance preconditioner, support clipping, accepted-at-least-once
    early stop, step-ratio halving — the reference's controller,
    Micmem_SMC_main.py:186-251) but the proposal drifts along the
    likelihood gradient, which JAX provides exactly through the on-device
    simulator — a move the reference's black-box SciPy/SUNDIALS workers
    cannot make (their solvers are not differentiable). HMC/Langevin
    mutation inside tempered SMC follows Buchholz, Chopin & Jacob,
    "Adaptive Tuning of Hamiltonian Monte Carlo within Sequential Monte
    Carlo" (arXiv:1808.07730).

    Proposal with preconditioner S = cov(particles)*cov_weight = L L^T and
    step ratio eps:

        theta' = theta + (eps^2/2) * gamma * grad_ll(theta) @ S
                       + eps * z @ L^T,  z ~ N(0, I)

    (the drift uses the TEMPERED-LIKELIHOOD gradient only; the exact MH
    correction below makes the chain target gamma*ll + log-prior exactly
    for ANY prior, smooth or not). Acceptance, in log space:

        (lk2-lk1)*gamma + (lp2-lp1) + log q(theta|theta') - log q(theta'|theta)

    with log q(x|y) = -|L^{-1}(x - y - drift(y))|^2 / (2 eps^2) (+ const).
    The forward term telescopes to -|z|^2/2 for free; the reverse term is
    one small (d,d) triangular inversion + an MXU (d,d)@(d,N) matmul.

    Non-finite likelihood gradients (diverged trajectories, -inf rows) are
    sanitized to 0 — those rows fall back to a pure random-walk proposal
    and stay subject to the exact accept test, so failures cost mixing,
    never correctness (the -inf/never-NaN invariant holds throughout).

    Requires ``loglik_fn`` to be JAX-differentiable; each sweep costs one
    VJP in addition to the forward sweep (~3x an RWM sweep) and buys
    O(d)-better mixing on smooth targets.
    """
    return _run_sweeps("mala", key, particles, log_lik, gamma, loglik_fn,
                       prior, cfg)


# --------------------------------------------------------------------------
# Preconditioned HMC mutation (gradient-based; beyond-reference capability)
# --------------------------------------------------------------------------
def hmc_mutation(key: jax.Array,
                 particles: jnp.ndarray,
                 log_lik: jnp.ndarray,
                 gamma: jnp.ndarray,
                 loglik_fn: Callable[[jnp.ndarray],
                                     Tuple[jnp.ndarray, object]],
                 prior: Prior,
                 cfg: SMCConfig) -> MutationResult:
    """Preconditioned Hamiltonian mutation sweeps (leapfrog proposals).

    Same adaptive scaffolding as :func:`mh_mutation` / :func:`mala_mutation`
    (per-sweep empirical-covariance preconditioner, accepted-at-least-once
    early stop, step-ratio halving — the reference controller,
    Micmem_SMC_main.py:186-251), but each proposal is ``cfg.hmc_leapfrog``
    leapfrog steps of Hamiltonian dynamics, which can traverse curved
    ridges a single Langevin drift (MALA) crosses only diffusively —
    HMC-within-SMC per Buchholz, Chopin & Jacob (arXiv:1808.07730).

    Runs in WHITENED coordinates w = L^{-1}(theta - mu) where
    S = cov(particles) * cov_weight = L L^T, identity mass matrix in w:
    position updates are ``theta += eps * (p @ L^T)`` and gradient kicks
    ``p += eps_k * gamma * (g @ L)`` — Cholesky matmuls only, no triangular
    inversion anywhere (CLAUDE.md large-batch LU hazard avoided by
    construction).

    The dynamics use the TEMPERED-LIKELIHOOD surrogate potential only
    (uniform priors are flat in the interior, so the surrogate is exact
    for the reference's prior modes); the acceptance applies the FULL
    target ratio plus the kinetic-energy difference:

        (lk2-lk1)*gamma + (lp2-lp1) - (|p_end|^2 - |p_0|^2)/2

    which is exact for any volume-preserving reversible proposal map, so
    the chain targets gamma*ll + log-prior for ANY prior. Out-of-support
    or non-finite endpoints are rejected outright (the -inf/never-NaN
    invariant holds; diverged rows cost mixing, never correctness).
    Each sweep costs ``hmc_leapfrog`` likelihood+VJP evaluations
    (cfg.evals_per_sweep feeds the driver's eval accounting).
    """
    return _run_sweeps("hmc", key, particles, log_lik, gamma, loglik_fn,
                       prior, cfg)


_MUTATION_KERNELS = {"rwm": mh_mutation, "mala": mala_mutation,
                     "hmc": hmc_mutation}


def mutate(key: jax.Array, particles: jnp.ndarray, log_lik: jnp.ndarray,
           gamma: jnp.ndarray, loglik_fn, prior: Prior,
           cfg: SMCConfig) -> MutationResult:
    """Dispatch to the configured mutation kernel (cfg.mutation)."""
    return _MUTATION_KERNELS[cfg.mutation](key, particles, log_lik, gamma,
                                           loglik_fn, prior, cfg)
