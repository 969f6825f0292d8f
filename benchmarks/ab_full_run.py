"""A/B: separate-init run path vs the single fused full-run program.

Quantifies the per-run HOST cost the fused program removes on the one-chip
tunnel: the separate path pays ~6 small init dispatches + per-run scalar
fetches (~20 ms round-trip each this session); the device program itself
is only ~29 ms at 1e5 particles (trace: benchmarks/profile_fused_trace.py).
"""
import time

import jax

from smc_tpu.utils.compile_cache import enable_persistent_cache


def main():
    enable_persistent_cache()
    from smc_tpu import SMCConfig, run_smc_on_device
    from smc_tpu.models.michaelis_menten import MichaelisMentenModel
    from smc_tpu.smc.driver import make_full_run_on_device, make_run_on_device

    model = MichaelisMentenModel.default(method="pallas_exact")
    cfg = SMCConfig(n_particles=100_000)
    reps = 10

    run_fn = make_run_on_device(model, cfg)
    s = run_smc_on_device(model, cfg, jax.random.key(0), run_fn=run_fn)
    jax.block_until_ready(s.particles)
    t0 = time.perf_counter()
    upd = 0.0
    for seed in range(1, reps + 1):
        s = run_smc_on_device(model, cfg, jax.random.key(seed),
                              run_fn=run_fn)
        g, e = jax.device_get((s.gamma, s.total_lik_evals))
        assert float(g) == 1.0
        upd += float(e)
    a = time.perf_counter() - t0
    print(f"separate init + sync fetch : {a / reps * 1e3:7.1f} ms/run "
          f"({upd / a / 1e6:5.1f}M upd/s)", flush=True)

    full = make_full_run_on_device(model, cfg)
    s = full(jax.random.key(0))
    jax.block_until_ready(s.particles)
    t0 = time.perf_counter()
    upd = 0.0
    pending = []
    for seed in range(1, reps + 1):
        s = full(jax.random.key(seed))
        pending.append((s.gamma, s.total_lik_evals))
        if len(pending) > 1:
            g, e = jax.device_get(pending.pop(0))
            assert float(g) == 1.0
            upd += float(e)
    for p in pending:
        g, e = jax.device_get(p)
        assert float(g) == 1.0
        upd += float(e)
    b = time.perf_counter() - t0
    print(f"fused full run, pipelined  : {b / reps * 1e3:7.1f} ms/run "
          f"({upd / b / 1e6:5.1f}M upd/s)", flush=True)


if __name__ == "__main__":
    main()
