"""Methanation DAE likelihood throughput (the flagship compute kernel).

One JSON line: particles/sec through the full 30-condition implicit-DAE
likelihood (each particle = 30 independent 7x51 BDF2 solves), plus the
implied DAE-solves/sec. The reference runs one SUNDIALS IDA solve per
condition per particle inside Ray workers on 30 CPU cores.
"""
import json
import sys
import time

import jax
import jax.numpy as jnp


def main(n: int = 256, chunk: int = 128):
    from smc_tpu.models.methanation import MethanationModel
    model = MethanationModel.default(n_conditions=30,
                                     particle_chunk=min(n, chunk))
    theta = jnp.tile(jnp.asarray([[13.04, 52.2e3, 1.147e5, 96.7e3, 5.0]],
                                 jnp.float32), (n, 1))
    f = jax.jit(model.log_likelihood)
    ll, _ = f(theta)
    jax.block_until_ready(ll)
    t0 = time.perf_counter()
    reps = 0
    while time.perf_counter() - t0 < 8.0:
        ll, _ = f(theta)
        jax.block_until_ready(ll)
        reps += 1
    dt = (time.perf_counter() - t0) / reps
    pps = n / dt
    # Measured single-core CPU baselines for the SAME discrete problem
    # (benchmarks/cpu_baseline_methanation.py, oracle-checked; docs/PERF.md
    # "Measured CPU baseline"); x30 = the reference's n_cores=30 node
    # assuming linear scaling (generous to the CPU).
    CPU_REF_PPS_CORE = 0.092    # per-particle sparse-LU Newton (reference
    #                             architecture class; IDA-equivalent method)
    CPU_BEST_PPS_CORE = 19.9    # XLA:CPU jit of this very engine (strongest
    #                             measured single-core implementation)
    print(json.dumps({
        "metric": "methanation DAE likelihood throughput",
        "value": round(pps, 1),
        "unit": "particles/s",
        "dae_solves_per_s": round(pps * 30, 1),
        "sweep_ms": round(dt * 1e3, 2),
        "chunk": chunk,
        "vs_30core_reference_equiv": round(pps / (30 * CPU_REF_PPS_CORE), 1),
        "vs_30core_best_cpu": round(pps / (30 * CPU_BEST_PPS_CORE), 2),
    }))


if __name__ == "__main__":
    main(chunk=int(sys.argv[1]) if len(sys.argv) > 1 else 128)
