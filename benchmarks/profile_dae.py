"""Component-level cost profile of the lanes-major DAE march.

Times each phase of one BDF step in isolation at the flagship batch width
(B = 128 particles x 30 conditions = 3840 lanes), repeated inside a fused
fori_loop so tunnel dispatch latency amortizes (CLAUDE.md rule). Prints a
JSON line per phase with per-step-per-lane cost and the implied march
budget; used for the roofline notes in docs/PERF.md.
"""
import functools
import json
import time

import jax
import jax.numpy as jnp


def timed(f, *args, reps=30, inner=8):
    """Median wall time of one f(*args), measured as a fused fori_loop of
    `inner` serially-dependent evaluations (a runtime-zero feedback term
    defeats CSE without changing values), so per-call dispatch amortizes.
    """
    from jax import lax

    @jax.jit
    def run(zero, args):
        def body(_, a):
            out = f(*a)
            s = zero * jax.tree_util.tree_leaves(out)[0].ravel()[0]
            return jax.tree_util.tree_map(
                lambda x: x + s.astype(x.dtype), a)
        a = lax.fori_loop(0, inner, body, args)
        return jax.tree_util.tree_leaves(a)[0]

    zero = jnp.float32(0.0)
    o = run(zero, args)
    jax.block_until_ready(o)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        o = run(zero, args)
        jax.block_until_ready(o)
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2] / inner


def main(n_particles=128, n_conditions=30):
    from smc_tpu.models.methanation import (
        MethanationModel, _analytic_CD_jac, _grid_flags, _rows_bl,
        initial_guess)
    from smc_tpu.ops import dae_fast as DF

    m = MethanationModel.default(n_conditions=n_conditions,
                                 particle_chunk=n_particles, noise=False)
    nc = m.cond.n_data
    bt = n_particles * nc
    kin = jnp.tile(jnp.asarray(
        [[13.04, 52.2e3, 1.147e5, 96.7e3, 23.34, -6.0, 0.72, -2.51e3]],
        jnp.float32).T, (1, bt))
    condv = jnp.tile(m._cond_vecs().T, (1, n_particles))
    y0 = initial_guess(m.cond, m.nx)
    y0 = jnp.moveaxis(y0, 0, -1).transpose(1, 0, 2)
    y0 = jnp.tile(y0, (1, 1, n_particles))                 # (7, NX, B)
    flags = _grid_flags(m.nx).T[:, :, None]

    def rows(y_m, y, y_p, yd):
        return _rows_bl(y_m, y, y_p, yd, flags, condv, kin)

    ajac = _analytic_CD_jac(flags, condv)
    nf, nx, _ = y0.shape

    def shift(y):
        y_m = jnp.concatenate([y[:, :1], y[:, :-1]], axis=1)
        y_p = jnp.concatenate([y[:, 1:], y[:, -1:]], axis=1)
        return y_m, y_p

    h = jnp.float32(1.0)
    alpha = jnp.float32(1.5)

    def residual(y):
        y_m, y_p = shift(y)
        yd = (alpha * y - 1.5 * y) / h
        return -jnp.moveaxis(rows(y_m, y, y_p, yd), 1, 0)

    def build_blocks(y):
        y_m, y_p = shift(y)
        yd = (alpha * y - 1.5 * y) / h
        given = ajac(y_m, y, y_p, yd)
        F, lin = jax.linearize(rows, y_m, y, y_p, yd)
        zeros = jnp.zeros_like(y)
        blocks = dict(given)
        for s in (0, 1):
            cols = []
            for f in range(nf):
                tang = [zeros] * 4
                e = jnp.zeros((nf, 1, 1), y0.dtype).at[f, 0, 0].set(1.0)
                tang[s] = jnp.broadcast_to(e, y.shape).astype(y0.dtype)
                cols.append(lin(*tang))
            blocks[s] = jnp.stack(cols, axis=1)
        A_, B_, C_, D_ = blocks[0], blocks[1], blocks[2], blocks[3]
        B_ = B_ + D_ * (alpha / h)
        to_scan = lambda M: jnp.moveaxis(M, 2, 0)
        A_, B_, C_ = to_scan(A_), to_scan(B_), to_scan(C_)
        B_ = B_.at[0].add(A_[0])
        B_ = B_.at[-1].add(C_[-1])
        A_ = A_.at[0].set(0.0)
        C_ = C_.at[-1].set(0.0)
        return A_, B_, C_, -jnp.moveaxis(F, 1, 0)

    A_, B_, C_, rhs = jax.jit(build_blocks)(y0)
    LUs, ms = jax.jit(DF.block_thomas_factor)(A_, B_, C_)
    jax.block_until_ready(ms)

    lane_step = 1e6 / bt  # -> microseconds per lane-step when mult by s
    res = {}
    res["residual"] = timed(residual, y0)
    res["jac_build(2 slots tangent + analytic CD)"] = timed(build_blocks, y0)
    res["thomas_factor"] = timed(DF.block_thomas_factor, A_, B_, C_)
    res["thomas_apply"] = timed(DF.block_thomas_apply, LUs, ms, C_, rhs)
    res["full_solve(bt_bl pivot)"] = timed(
        functools.partial(DF.block_thomas_bl, pivot=True), A_, B_, C_, rhs)

    for k, v in res.items():
        print(json.dumps({"phase": k, "ms": round(v * 1e3, 3),
                          "ns_per_lane": round(v * 1e9 / bt, 1)}),
              flush=True)
    factor_step = (res["jac_build(2 slots tangent + analytic CD)"]
                   + res["thomas_factor"] + 2 * res["thomas_apply"])
    reuse_step = 2 * (res["residual"] + res["thomas_apply"])
    print(json.dumps({
        "modeled_factor_step_ms": round(factor_step * 1e3, 3),
        "modeled_reuse_step_ms": round(reuse_step * 1e3, 3),
        "modeled_48step_stride4_tail4_ms": round(
            (15 * factor_step + 33 * reuse_step) * 1e3, 2),
    }))


if __name__ == "__main__":
    main()
