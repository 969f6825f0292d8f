"""Multi-chip scaling model: measure the collective traffic XLA inserts.

Real multi-chip hardware is not available in this environment, so linear
particle-axis scaling cannot be measured directly. What CAN be measured is
the exact set of collectives (op, payload bytes, count) the SPMD
partitioner inserts into the sharded SMC step — the complete per-step
ICI traffic. Comparing that traffic against the measured single-chip
per-step compute time bounds the scaling efficiency from first
principles: efficiency >= compute / (compute + traffic/ICI_bw).

Run on the virtual CPU mesh (the partitioned HLO is platform-independent
in its collective structure):

    python benchmarks/scaling_model.py [n_devices]

Method: jit the single SMC step with sharded-in/sharded-out particle
arrays, compile, and parse the optimized HLO for collective instructions
(all-reduce / all-gather / reduce-scatter / collective-permute /
all-to-all), accumulating payload bytes from the instruction shapes.
Instructions inside while-loop bodies are counted once and reported with
the loop they live in; the per-SMC-step totals then weight the MH-sweep
loop body by the flagship's measured sweep count.
"""
import os
import re
import sys

N_DEV = int(sys.argv[1]) if len(sys.argv) > 1 else 8
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                           f" --xla_force_host_platform_device_count={N_DEV}")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from smc_tpu import SMCConfig  # noqa: E402
from smc_tpu.models.michaelis_menten import MichaelisMentenModel  # noqa: E402
from smc_tpu.parallel.mesh import make_mesh, particle_sharding  # noqa: E402
from smc_tpu.smc.driver import init_state, make_smc_step  # noqa: E402

_DTYPE_BYTES = {"f32": 4, "f64": 8, "bf16": 2, "f16": 2, "s32": 4, "u32": 4,
                "s64": 8, "u64": 8, "s16": 2, "u16": 2, "s8": 1, "u8": 1,
                "pred": 1}

_COLLECTIVES = ("all-reduce", "all-gather", "reduce-scatter",
                "collective-permute", "all-to-all")


def _shape_bytes(shape_str: str) -> int:
    """Total bytes of an HLO result shape string like
    'f32[128,3]{1,0}' or '(f32[8]{0}, s32[8]{0})'."""
    total = 0
    for m in re.finditer(r"(\w+)\[([\d,]*)\]", shape_str):
        dt, dims = m.group(1), m.group(2)
        nb = _DTYPE_BYTES.get(dt)
        if nb is None:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * nb
    return total


def collect_collectives(hlo_text: str):
    """[(op, result_bytes, full_line)] for every collective instruction."""
    out = []
    for line in hlo_text.splitlines():
        ls = line.strip()
        m = re.match(r"%?[\w.\-]+ = (\([^)]*\)|[^ ]+) ([\w-]+)(\(|-start\()",
                     ls)
        if not m:
            continue
        op = m.group(2)
        if op in _COLLECTIVES:
            out.append((op, _shape_bytes(m.group(1)), ls))
    return out


def main():
    n = 100_000
    model = MichaelisMentenModel.default(method="exact")
    cfg = SMCConfig(n_particles=n)
    mesh = make_mesh(N_DEV)
    psh = particle_sharding(mesh)

    state = init_state(jax.random.key(0), model, cfg)
    state = state.replace(particles=jax.device_put(state.particles, psh),
                          log_lik=jax.device_put(state.log_lik, psh))
    step = make_smc_step(model, cfg, donate=False, psharding=psh)
    compiled = step.lower(state).compile()
    txt = compiled.as_text()

    cols = collect_collectives(txt)
    print(f"== sharded SMC step, N={n}, {N_DEV} devices "
          f"(per-shard {n // N_DEV} particles) ==")
    by_op = {}
    for op, b, line in cols:
        by_op.setdefault(op, []).append(b)
    total = 0
    for op, sizes in sorted(by_op.items()):
        s = sum(sizes)
        total += s
        print(f"  {op:20s} x{len(sizes):3d}   {s:>12,d} B total   "
              f"(max single {max(sizes):,d} B)")
    print(f"  {'TOTAL':20s}        {total:>12,d} B "
          f"({total / n:.2f} B/particle global)")
    print()
    print("largest collective payloads:")
    for op, b, line in sorted(cols, key=lambda t: -t[1])[:6]:
        print(f"  {b:>12,d} B  {line[:140]}")

    # Same step with the ring-exchange resampler (cfg.resampling="ring"):
    # the O(N) all-gather/all-reduce of the resampling index build is
    # replaced by per-round block ppermutes inside a while_loop (counted
    # once here; executed rounds are data-dependent, 0-1 for the
    # near-diagonal ancestor maps SMC produces).
    cfg_r = SMCConfig(n_particles=n, resampling="ring")
    step_r = make_smc_step(model, cfg_r, donate=False, psharding=psh)
    cols_r = collect_collectives(step_r.lower(state).compile().as_text())
    by_op_r = {}
    for op, b, _ in cols_r:
        by_op_r.setdefault(op, []).append(b)
    total_r = sum(b for _, b, _ in cols_r)
    print(f"\n== same step, resampling='ring' ==")
    for op, sizes in sorted(by_op_r.items()):
        print(f"  {op:20s} x{len(sizes):3d}   {sum(sizes):>12,d} B total")
    print(f"  {'TOTAL':20s}        {total_r:>12,d} B "
          f"({total_r / n:.2f} B/particle; ppermute bytes are per ring "
          f"round)")

    # Per-particle invariant check at a second N: collective bytes that
    # scale with N (the resampling exchange) vs fixed scalar reductions.
    n2 = 12_800
    cfg2 = SMCConfig(n_particles=n2)
    st2 = init_state(jax.random.key(0), model, cfg2)
    st2 = st2.replace(particles=jax.device_put(st2.particles, psh),
                      log_lik=jax.device_put(st2.log_lik, psh))
    step2 = make_smc_step(model, cfg2, donate=False, psharding=psh)
    cols2 = collect_collectives(step2.lower(st2).compile().as_text())
    t2 = sum(b for _, b, _ in cols2)
    print(f"\nN={n2}: total {t2:,d} B ({t2 / n2:.2f} B/particle global)")
    c = (total - t2) / (n - n2) if n != n2 else 0.0
    fixed = total - c * n
    print(f"decomposition: ~{c:.2f} B/particle N-scaling + "
          f"~{max(fixed, 0.0):,.0f} B fixed scalar reductions per step")

    # ---- DAE (methanation) step: the flagship's collectives ------------
    # The DAE march is entirely lane-local (each particle x condition lane
    # solves its own reactor), so the sharded step's collectives should be
    # exactly the SMC machinery's — scalar reductions + resampling — with
    # nothing added by the likelihood. Verified here on a coarse grid (the
    # collective structure is independent of nx / n_steps; XLA:CPU cannot
    # compile the nx=51 unrolled march in reasonable time, CLAUDE.md).
    from smc_tpu.models.methanation import MethanationModel
    nd = 2048
    dae = MethanationModel.default(n_conditions=4, nx=11, n_steps=6,
                                   growth=1.6, particle_chunk=nd)
    dcfg = SMCConfig(n_particles=nd, resampling="ring")
    dst = init_state(jax.random.key(1), dae, dcfg)
    dst = dst.replace(particles=jax.device_put(dst.particles, psh),
                      log_lik=jax.device_put(dst.log_lik, psh))
    dstep = make_smc_step(dae, dcfg, donate=False, psharding=psh)
    cols_d = collect_collectives(dstep.lower(dst).compile().as_text())
    by_op_d = {}
    for op, b, _ in cols_d:
        by_op_d.setdefault(op, []).append(b)
    total_d = sum(b for _, b, _ in cols_d)
    print(f"\n== methanation (DAE) step, N={nd}, resampling='ring' ==")
    for op, sizes in sorted(by_op_d.items()):
        print(f"  {op:20s} x{len(sizes):3d}   {sum(sizes):>12,d} B total")
    print(f"  {'TOTAL':20s}        {total_d:>12,d} B "
          f"({total_d / nd:.2f} B/particle; ppermute bytes per ring round)")

    # ---- v5e-16 projection for the 1e6-particle north-star config ------
    # Measured inputs: 1,530 particles/s/chip through the nx=51 DAE
    # likelihood (benchmarks/bench_methanation.py); ~2.5 sweeps/step
    # average on the flagship tempering path; ring-path traffic from the
    # DAE section above scaled per-particle; v5e ICI ~1e11 B/s/chip,
    # scalar-collective latency floor ~10 us.
    chips, n_ns = 16, 1_000_000
    shard = n_ns / chips
    sweep_s = shard / 1530.0
    step_compute = 2.5 * sweep_s
    scalar_b = total_d  # fixed scalar reductions dominate the ring path
    ring_round_b = 2 * shard * (5 + 2) * 4  # fwd+bwd block ppermute, d=5
    t_coll = scalar_b / 1e11 + 10e-6 * len(cols_d) + ring_round_b / 1e11
    print(f"\n== v5e-16 projection, N=1e6 methanation ==")
    print(f"  per-chip shard {shard:,.0f} particles; per-step compute "
          f"~{step_compute:.1f} s")
    print(f"  per-step collectives: ~{scalar_b:,d} B scalar + "
          f"<=1 ring round {ring_round_b:,.0f} B  ->  ~{t_coll * 1e3:.2f} ms")
    print(f"  collective share of step time: "
          f"{100 * t_coll / (step_compute + t_coll):.4f}%  "
          f"(scaling efficiency ~{100 * step_compute / (step_compute + t_coll):.2f}%)")
    print(f"  full posterior (~12 steps, ~30 sweeps): "
          f"~{30 * sweep_s / 60:.0f} min on 16 chips")


if __name__ == "__main__":
    main()
