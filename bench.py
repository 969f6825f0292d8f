"""Headline benchmark: particle-weight-updates/sec/chip at 10^5 particles.

Workload (from BASELINE.json): the Michaelis-Menten likelihood-tempered SMC
at N=100,000 particles x 6 datasets x 40 observation points, RK4 likelihood
(comparable numerical work to the reference's scipy RK45 path,
SMC_example/Micmem_likelihood.py:24-30). One "particle weight update" = one
per-particle likelihood evaluation feeding a weight/acceptance update — the
same unit of work the reference dispatches as one Ray task
(Micmem_likelihood.py:83).

``vs_baseline``: the reference publishes no numbers (BASELINE.md), so the
baseline is measured here: the per-update cost of an equivalent
NumPy/SciPy solve_ivp likelihood on one host core, scaled by the
reference's default 30-core Ray pool (methanation_set_conditon.py:107) —
i.e. vs_baseline = TPU updates/sec / (30 x single-core CPU updates/sec).
"""
import json
import time

import numpy as np


def _cpu_baseline_updates_per_sec(n_probe: int = 30, repeats: int = 3) -> float:
    """Single-core scipy RK45 likelihood throughput (reference-equivalent).

    Best of ``repeats`` timings: the one-core host shares with background
    services, so a single probe can read ~2x slow; the minimum time is the
    stable estimate of the machine's actual single-core capability."""
    from scipy.integrate import solve_ivp

    ts = np.linspace(0, 10, 40)
    s0s = [2.0, 0.1, 0.25, 0.5, 1.0, 2.0]
    rng = np.random.default_rng(0)
    thetas = np.column_stack([rng.uniform(0.5, 3, n_probe),
                              rng.uniform(0.1, 2, n_probe),
                              rng.uniform(0.01, 1, n_probe)])
    obs = rng.normal(0.5, 0.1, (6, 40))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        for Vmax, Km, sigma in thetas:
            total = 0.0
            for i, s0 in enumerate(s0s):
                sol = solve_ivp(lambda t, S: -Vmax * S / (Km + S), (0, 10),
                                [s0], t_eval=ts, method="RK45")
                r = obs[i] - (s0 - sol.y[0])
                total += -0.5 * 40 * np.log(2 * np.pi * sigma ** 2) \
                    - np.sum(r ** 2) / (2 * sigma ** 2)
        best = min(best, time.perf_counter() - t0)
    return n_probe / best


def main():
    import jax
    from smc_tpu import SMCConfig
    from smc_tpu.models.michaelis_menten import MichaelisMentenModel
    from smc_tpu.utils.compile_cache import enable_persistent_cache

    # Compile time is excluded from the measurement either way; the
    # persistent cache just makes repeat invocations start fast.
    enable_persistent_cache()

    n = 100_000
    # "pallas_exact" (fused VMEM-resident Lambert-W kernel,
    # ops/mm_pallas.py) is the flagship MM likelihood: the same closed-form
    # integral the reference's scipy RK45 approximates (no discretization
    # error, no stiffness instability), evaluated with a z-recurrence and a
    # rational-initializer Halley solve — measured 1.4x the jnp "exact"
    # path end-to-end on one v5e chip (docs/PARITY.md records the
    # shootout: pallas_exact 16.98M > exact 12.08M > rk4/pallas-rk4).
    model = MichaelisMentenModel.default(method="pallas_exact")
    cfg = SMCConfig(n_particles=n)

    # Deployment mode: the ENTIRE tempered-SMC run (prior draw + init sweep
    # + all tempering steps to gamma=1) is ONE fused XLA program, and the
    # timed loop dispatches BATCHES of K=16 independent runs per device
    # call (lax.map over keys — sequential on device, identical per-run
    # work). Rationale: the per-call tunnel round-trip varies 0.02-14 ms
    # between sessions; measured same-session A/B
    # (benchmarks/ab_dispatch_batch.py): per-run pipelined dispatch 70.7 M
    # updates/s vs 95.6 (K=8) / 107.8 (K=16) — batching amortizes the
    # host/tunnel cost so the measurement converges to the device compute
    # rate (~29 ms/run on the TensorCore) regardless of tunnel health.
    # Batches are additionally software-pipelined (batch k's scalars are
    # fetched while batch k+1 executes). Warm-up call compiles.
    from jax import lax
    from smc_tpu.smc.driver import make_full_run_on_device
    run_fn = make_full_run_on_device(model, cfg)
    K = 16

    @jax.jit
    def run_many(key):
        def one(kk):
            s = run_fn(kk)
            return s.gamma, s.total_lik_evals
        return lax.map(one, jax.random.split(key, K))

    g, e = run_many(jax.random.key(0))
    jax.block_until_ready(e)
    assert float(g.min()) == 1.0

    t0 = time.perf_counter()
    updates = 0.0
    pending = []
    seed = 1
    while time.perf_counter() - t0 < 10.0:
        pending.append(run_many(jax.random.key(seed)))
        seed += 1
        if len(pending) > 1:
            g, e = jax.device_get(pending.pop(0))
            assert float(g.min()) == 1.0
            updates += float(e.sum())
    for p in pending:                      # drain inside the timed window
        g, e = jax.device_get(p)
        assert float(g.min()) == 1.0
        updates += float(e.sum())
    dt = time.perf_counter() - t0
    ups = updates / dt

    cpu_1core = _cpu_baseline_updates_per_sec()
    baseline_30core = 30.0 * cpu_1core
    # The live probe swings ~2x with host load (70,485 -> 41,648 between
    # rounds, docs/PERF.md "vs_baseline variance"); PINNED uses the
    # recorded calibrated idle single-core figure (112.6 updates/s/core,
    # PERF.md) so cross-round JSONs stay comparable. Both are emitted:
    # vs_baseline (live, contract key) + vs_baseline_pinned (stable).
    PINNED_CPU_1CORE = 112.6

    print(json.dumps({
        "metric": "particle-weight-updates/sec/chip @ 1e5 particles (MM)",
        "value": round(ups, 1),
        "unit": "updates/s",
        "vs_baseline": round(ups / baseline_30core, 2),
        "vs_baseline_pinned": round(ups / (30.0 * PINNED_CPU_1CORE), 2),
        "cpu_probe_updates_per_s_core": round(cpu_1core, 1),
    }))


if __name__ == "__main__":
    main()
