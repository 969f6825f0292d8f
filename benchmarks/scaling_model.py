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


if __name__ == "__main__":
    main()
