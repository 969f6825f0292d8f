"""Accuracy/cost sweep for the IDA-style lagged-Jacobian DAE march.

Phase "acc": outlet-flow error of each (jac_stride, n_dense, reuse_iters)
candidate vs a dense 96-step x 4-Newton reference, at the true kinetics +
prior-region draws (small batch; compile-dominated). Accuracy bar:
max |flow - ref| <= ~1 sccm (obs noise sigma_true = 5) — the same bar the
48x2 defaults were picked against.

Phase "perf": likelihood throughput at n=128 particles x 30 conditions for
the configs given on the command line (e.g. "4,0,2").
"""
import dataclasses
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def _draws(n=8):
    from smc_tpu.models.methanation import KIN_TRUE
    rng = np.random.default_rng(0)
    kins = [np.asarray(KIN_TRUE)]
    for _ in range(n - 1):
        k = np.asarray(KIN_TRUE) * rng.uniform(0.7, 1.4, 8)
        k[1] = KIN_TRUE[1] * rng.uniform(0.95, 1.05)   # Eaf: exp-sensitive
        k[3] = KIN_TRUE[3] * rng.uniform(0.95, 1.05)
        kins.append(k)
    return jnp.asarray(np.stack(kins), jnp.float32)


def flows_for(model, kins):
    out = jax.jit(model._flows_batch_bl)(kins)
    jax.block_until_ready(out)
    return np.asarray(out)


def phase_acc(base, grid):
    kins = _draws()
    ref_model = dataclasses.replace(base, n_steps=96, newton_iters=4,
                                    growth=1.13)
    ref = flows_for(ref_model, kins)
    ok = np.all(ref > -9999, axis=(1, 2))
    print(f"# reference solved {ok.sum()}/{len(ok)} draws", flush=True)

    cur = flows_for(base, kins)
    print(json.dumps({"cfg": "current-48x2-stride1",
                      "max_err_sccm": round(float(np.abs(cur - ref)[ok].max()), 3)}),
          flush=True)
    for stride, nd, ri in grid:
        m = dataclasses.replace(base, jac_stride=stride, n_dense=nd,
                                reuse_iters=ri)
        fl = flows_for(m, kins)
        solved = np.all(fl > -9999, axis=(1, 2))
        err = np.abs(fl - ref)[ok & solved].max() if (ok & solved).any() \
            else float("inf")
        print(json.dumps({"cfg": f"{stride},{nd},{ri}",
                          "max_err_sccm": round(float(err), 3),
                          "solved": int(solved.sum())}), flush=True)


def phase_perf(base, grid, n=128, seconds=5.0):
    theta = jnp.tile(jnp.asarray([[13.04, 52.2e3, 1.147e5, 96.7e3, 5.0]],
                                 jnp.float32), (n, 1))
    for cfg in [None] + list(grid):
        m = base if cfg is None else dataclasses.replace(
            base, jac_stride=cfg[0], n_dense=cfg[1], reuse_iters=cfg[2],
            dense_tail=cfg[3] if len(cfg) > 3 else 0)
        f = jax.jit(m.log_likelihood)
        ll, _ = f(theta)
        jax.block_until_ready(ll)
        t0 = time.perf_counter()
        reps = 0
        while time.perf_counter() - t0 < seconds:
            ll, _ = f(theta)
            jax.block_until_ready(ll)
            reps += 1
        pps = n * reps / (time.perf_counter() - t0)
        print(json.dumps({"cfg": "current" if cfg is None else
                          ",".join(map(str, cfg)),
                          "pps": round(pps, 1)}), flush=True)


def main():
    from smc_tpu.models.methanation import MethanationModel
    phase = sys.argv[1] if len(sys.argv) > 1 else "acc"
    base = MethanationModel.default(n_conditions=30, particle_chunk=128,
                                    noise=False)
    if phase == "acc":
        grid = [(s, nd, ri) for s in (3, 4, 6) for nd in (0, 9)
                for ri in (2, 3)]
        grid = [(s, nd if (48 - nd) % s == 0 else s * 2, ri)
                for s, nd, ri in grid]
        phase_acc(base, sorted(set(grid)))
    else:
        grid = [tuple(int(v) for v in c.split(",")) for c in sys.argv[2:]]
        phase_perf(base, grid)


if __name__ == "__main__":
    main()
