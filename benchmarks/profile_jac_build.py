"""Split the analytic-Jacobian factor-step cost: partials vs assembly vs
transpose vs factor, at the flagship methanation shape (B = 128 x 30).

The march's 13 factor steps (~26 ms of the ~80 ms sweep) are the largest
single DAE cost (docs/PERF.md); this pins where inside the build the time
goes so the optimization targets the right part. fori-amortized (CLAUDE.md
dispatch rule).
"""
import json
import time

import jax
import jax.numpy as jnp

from smc_tpu.utils.compile_cache import enable_persistent_cache


def timed(f, *args, reps=20, inner=8):
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
    enable_persistent_cache()
    from smc_tpu.models.methanation import (
        MethanationModel, _analytic_full_jac, _grid_flags, _rows_bl,
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

    jac = _analytic_full_jac(flags, condv, kin)
    nf, nx, _ = y0.shape
    h, alpha = jnp.float32(1.0), jnp.float32(1.5)

    def shift(y):
        y_m = jnp.concatenate([y[:, :1], y[:, :-1]], axis=1)
        y_p = jnp.concatenate([y[:, 1:], y[:, -1:]], axis=1)
        return y_m, y_p

    def prep(y):
        y_m, y_p = shift(y)
        yd = (alpha * y - 1.5 * y) / h
        return y_m, y_p, yd

    def residual(y):
        y_m, y_p, yd = prep(y)
        return -jnp.moveaxis(_rows_bl(y_m, y, y_p, yd, flags, condv, kin),
                             1, 0)

    def blocks_rc(y):
        """Blocks in build layout (7, ncol, NX, B) — no scan transpose."""
        y_m, y_p, yd = prep(y)
        bl = jac(y_m, y, y_p, yd)
        return bl[0], bl[1] + bl[3] * (alpha / h), bl[2]

    def blocks_scan(y):
        """Full build as the march consumes it: + transpose + edge folds."""
        A_, B_, C_ = blocks_rc(y)
        to_scan = lambda M: jnp.moveaxis(M, 2, 0)
        A_, B_, C_ = to_scan(A_), to_scan(B_), to_scan(C_)
        B_ = B_.at[0].add(A_[0])
        B_ = B_.at[-1].add(C_[-1])
        A_ = A_.at[0].set(0.0)
        C_ = C_.at[-1].set(0.0)
        return A_, B_, C_

    def partials_only(y):
        """Every entry VALUE the build computes, reduced without the dense
        (7, 7, NX, B) materialization: same math, no assembly writes."""
        A_, B_, C_ = blocks_rc(y)
        # sum over block rows/cols only (keeps (NX, B) live) — the stacks
        # themselves can't be DCE'd but their WRITE cost shows up in
        # blocks_rc; this variant instead re-derives from the entry sums.
        return A_.sum((0, 1)) + B_.sum((0, 1)) + C_.sum((0, 1))

    A_, B_, C_ = jax.jit(blocks_scan)(y0)
    rhs = jax.jit(residual)(y0)
    LUs, ms = jax.jit(DF.block_thomas_factor)(A_, B_, C_)
    jax.block_until_ready(ms)

    res = {
        "residual": timed(residual, y0),
        "partials+asm, rc layout (no transpose)": timed(blocks_rc, y0),
        "full build (asm + transpose + folds)": timed(blocks_scan, y0),
        "entry values, summed (fused away asm?)": timed(partials_only, y0),
        "thomas_factor": timed(DF.block_thomas_factor, A_, B_, C_),
        "thomas_apply": timed(DF.block_thomas_apply, LUs, ms, C_, rhs),
    }
    for k, v in res.items():
        print(json.dumps({"phase": k, "ms": round(v * 1e3, 3)}), flush=True)


if __name__ == "__main__":
    main()
