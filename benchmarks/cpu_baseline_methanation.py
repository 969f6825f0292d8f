"""Measured single-node CPU baseline for the methanation DAE likelihood.

Grounds the BASELINE.md north-star ">100x single-node CPU throughput"
claim with a MEASURED number (round-2 verdict item 1): the reference's
flagship worker is one SUNDIALS-IDA solve per experimental condition per
particle on 30 CPU cores (methanation_set_likelihood.py:144-277,
methanation_functions.py:44-65). Assimulo/SUNDIALS and numba are not
installable in this image, so this script implements the same discrete
problem the TPU engine solves — 48 variable-step BDF2 steps x Newton on
the 7xNX block-tridiagonal reactor system, geometric schedule to t=75 —
in float64 numpy/scipy, three ways:

  --mode particle   one particle at a time (the reference's architecture):
                    tolerance-exited Newton, IDA-style Jacobian reuse,
                    FD block-colored Jacobian (21 residual evals — STRONGER
                    than IDA's default dense FD, 357 evals), sparse LU.
  --mode batched    all particles' conditions batched on a trailing numpy
                    axis (the lanes-major layout on CPU): fixed TPU-engine
                    iteration schedule, batched block-Thomas via LAPACK.
                    This is the strongest single-core CPU design we can
                    construct and therefore the CONSERVATIVE baseline.
  --mode xla        jax/XLA:CPU jit of the repo's own lanes-major engine.

Throughput is reported per CORE; the reference ran n_cores=30
(methanation_set_conditon.py:107), so the honest comparison is
TPU particles/s vs 30 x (best single-core particles/s).

Each mode prints one JSON line {"mode", "particles_per_s", "solves_per_s",
"n_particles", "check_max_rel"}. The check field is the max relative
outlet-flow difference vs the repo's blocked oracle engine at the true
parameters (accuracy parity guard, not just speed).
"""
import argparse
import json
import os
import sys
import time

os.environ.setdefault("OMP_NUM_THREADS", "1")

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# Physics constants mirrored from smc_tpu/models/methanation.py (the
# behavioral spec shared with the reference, methanation_set_conditon.py:
# 73-89); float64 here.
SC = np.array([-4.0, -1.0, 1.0, 2.0, 0.0])
DZ_DISP = 0.95e-5
RHOS = 5075.0
HR = -164940.0
R_GAS = 8.3144589
AREA = float(np.pi * (0.01 / 2) ** 2)
CPG = 2800.0
CPS = 698.0
KEFF = 0.72
DINT = 0.005
U_HT = 68.2480
P_STP = 1.013e5
MOLW = np.array([2.0, 44.0, 16.0, 18.0, 40.0])
KIN_TRUE = (13.04, 52.2e3, 1.147e5, 96.7e3, 23.34, -6.0, 0.72, -2.51e3)


def geometric_schedule(t_final, n_steps, growth):
    w = growth ** np.arange(n_steps)
    return t_final * w / w.sum()


def residual(y, yd, condv, kin):
    """DAE residual, float64. y/yd: (nx, 7, ...) with species 0..4, T=5,
    u=6; condv: (5, ...) = [T_jacket, u_in, void, dz, P0]; kin: (8, ...).
    Same physics as models/methanation._rows_bl (reference residual
    methanation_set_likelihood.py:69-139 incl. its quirks: one-sided
    dispersion + transient total-mass/unscaled-energy rows at the first
    interior point, swapped T/u outlet rows, max(0.001, PH2) rate guard)."""
    nx = y.shape[0]
    tj, u_in, void, dz, P0 = condv[:5]
    C, T, u = y[:, :5], y[:, 5], y[:, 6]
    Cd, Td = yd[:, :5], yd[:, 5]
    y_m = np.concatenate([y[:1], y[:-1]], axis=0)
    y_p = np.concatenate([y[1:], y[-1:]], axis=0)
    C_m, T_m, u_m = y_m[:, :5], y_m[:, 5], y_m[:, 6]
    C_p, T_p = y_p[:, :5], y_p[:, 5]

    # rate law (func_rCH4)
    RT6 = R_GAS * T * 1e-6
    PH2, PCO2, PCH4, PH2O = (C[:, 0] * RT6, C[:, 1] * RT6, C[:, 2] * RT6,
                             C[:, 3] * RT6)
    kf = kin[0] * np.exp(-kin[1] / (R_GAS * T))
    ks = kin[2] * np.exp(-kin[3] / (R_GAS * T))
    kCO2 = kin[4] * np.exp(-kin[5] / (R_GAS * T))
    kH2O = kin[6] * np.exp(-kin[7] / (R_GAS * T))
    rf = 5075e3 * kf * kCO2 * PCO2 * np.maximum(0.001, PH2) ** 0.5 \
        / (1.0 + kCO2 * PCO2) ** 2
    rr = 5075e3 * ks * kH2O * PH2O * PCH4 ** 2 / (1.0 + kH2O * PH2O) ** 2
    r = rf - rr  # (nx, ...)

    shp = [1, 5] + [1] * (y.ndim - 2)
    sc = SC.reshape(shp)
    rr5 = r[:, None]
    conv = (u[:, None] * C - u_m[:, None] * C_m) / dz
    lap_first = (C_p - C) / dz ** 2
    lap_int = (C_p - 2.0 * C + C_m) / dz ** 2
    first = np.zeros((nx,) + (1,) * (y.ndim - 1)); first[1] = 1.0
    lap = np.where(first > 0, lap_first, lap_int)
    res_c = -void * Cd - conv + void * DZ_DISP * lap + (1 - void) * sc * rr5

    invT_m, invT, invT_p = 1.0 / T_m, 1.0 / T, 1.0 / T_p
    tmb = (-u * P0 * (invT - invT_m) / dz
           - P0 * invT * (u - u_m) / dz
           + void * DZ_DISP * P0 * (invT_p - 2.0 * invT + invT_m) / dz ** 2
           + (1 - void) * R_GAS * (-2.0) * r)
    tmb = tmb + np.where(first[:, 0] > 0, P0 * void * invT ** 2 * Td, 0.0)

    mw = MOLW.reshape(shp)
    rho = P0 / (R_GAS * T) * (C * mw).sum(1) / C.sum(1) * 1e-3
    heatcap = void * rho * CPG + (1 - void) * RHOS * CPS
    kappa = np.where(first[:, 0] > 0, 1.0, 0.1)
    enb = (-kappa * heatcap * Td
           - rho * CPG * (T * u - T_m * u_m) / dz
           + KEFF * (T_p - 2.0 * T + T_m) / dz ** 2
           + (1 - void) * (-HR) * r
           - 2.0 * U_HT / DINT * (T - tj))

    pde = np.concatenate([res_c, tmb[:, None], enb[:, None]], axis=1)
    inlet = np.concatenate([Cd, Td[:, None], (u - u_in)[:, None]], axis=1)
    outlet = np.concatenate([C - C_m, (u - u_m)[:, None],
                             (T - T_m)[:, None]], axis=1)
    is_in = np.zeros_like(first); is_in[0] = 1.0
    is_out = np.zeros_like(first); is_out[-1] = 1.0
    return np.where(is_in > 0, inlet, np.where(is_out > 0, outlet, pde))


def initial_guess(condv, nx, trailing=()):
    y = np.zeros((nx, 7) + trailing)
    y[:, :5] = condv[5:10].reshape((1, 5) + trailing)
    y[:, 5] = 400.0
    y[0, 5] = condv[10]
    y[:, 6] = condv[1]
    return y


TYP = np.array([10.0, 10.0, 10.0, 10.0, 10.0, 400.0, 0.1])  # FD scales


def fd_blocks(y, yd, condv, kin, alpha_h):
    """FD Jacobian of residual + (alpha/h)*dF/dyd as block tridiagonal
    (A sub, B diag, C super), each (nx, 7, 7): 21 colored y-perturbations
    (grid stride 3 x 7 vars) + 7 yd-perturbations (block diagonal)."""
    nx = y.shape[0]
    F0 = residual(y, yd, condv, kin)
    A = np.zeros((nx, 7, 7)); B = np.zeros((nx, 7, 7)); Cc = np.zeros((nx, 7, 7))
    for b in range(7):
        eps = 1e-7 * np.maximum(np.abs(y[:, b]), TYP[b])
        for ph in range(3):
            dy = np.zeros_like(y)
            dy[ph::3, b] = eps[ph::3]
            dF = (residual(y + dy, yd, condv, kin) - F0)
            for j in range(ph, nx, 3):
                e = eps[j]
                B[j, :, b] += dF[j] / e
                if j + 1 < nx:
                    A[j + 1, :, b] += dF[j + 1] / e
                if j - 1 >= 0:
                    Cc[j - 1, :, b] += dF[j - 1] / e
        # yd coupling is same-point only
        dyd = np.zeros_like(yd)
        dyd[:, b] = eps
        dF = (residual(y, yd + dyd, condv, kin) - F0)
        B[:, :, b] += alpha_h * dF / eps[:, None]
    return A, B, Cc, F0


def fd_blocks_batched(y, yd, condv, kin, alpha_h):
    """Batched variant: y (nx, 7, Bt). Same coloring; returns blocks
    (nx, 7, 7, Bt)."""
    nx, _, Bt = y.shape
    F0 = residual(y, yd, condv, kin)
    A = np.zeros((nx, 7, 7, Bt)); B = np.zeros((nx, 7, 7, Bt))
    Cc = np.zeros((nx, 7, 7, Bt))
    for b in range(7):
        eps = 1e-7 * np.maximum(np.abs(y[:, b]), TYP[b])  # (nx, Bt)
        for ph in range(3):
            dy = np.zeros_like(y)
            dy[ph::3, b] = eps[ph::3]
            dF = residual(y + dy, yd, condv, kin) - F0
            for j in range(ph, nx, 3):
                e = eps[j]
                B[j, :, b] += dF[j] / e
                if j + 1 < nx:
                    A[j + 1, :, b] += dF[j + 1] / e
                if j - 1 >= 0:
                    Cc[j - 1, :, b] += dF[j - 1] / e
        dyd = np.zeros_like(yd)
        dyd[:, b] = eps
        dF = residual(y, yd + dyd, condv, kin) - F0
        B[:, :, b] += alpha_h * dF / eps[:, None]
    return A, B, Cc, F0


# ---------------------------------------------------------------------------
# mode "particle": per-particle sparse-LU Newton (reference architecture)
# ---------------------------------------------------------------------------
def solve_particle(condv, kin, dts, nx):
    import scipy.sparse as sp
    import scipy.sparse.linalg as spl

    y = initial_guess(condv, nx)
    y_nm1 = y.copy()
    h_prev = dts[0]
    lu = None
    slow = True  # force factor at step 0
    rows_ix = np.arange(nx * 7)
    for k, h in enumerate(dts):
        r = 0.0 if k == 0 else h / h_prev
        alpha = (1.0 + 2.0 * r) / (1.0 + r)
        const = -(1.0 + r) * y + (r * r / (1.0 + r)) * y_nm1
        y_n = y.copy()
        iters = 0
        for it in range(6):
            yd = (alpha * y + const) / h
            if lu is None or slow or (it == 0 and k % 6 == 0):
                A, B, Cc, F = fd_blocks(y, yd, condv, kin, alpha / h)
                # fold duplicated boundary slots like the engine does
                B[0] += A[0]; A[0] = 0.0
                B[-1] += Cc[-1]; Cc[-1] = 0.0
                J = sp.lil_matrix((nx * 7, nx * 7))
                for j in range(nx):
                    J[7 * j:7 * j + 7, 7 * j:7 * j + 7] = B[j]
                    if j > 0:
                        J[7 * j:7 * j + 7, 7 * (j - 1):7 * (j - 1) + 7] = A[j]
                    if j < nx - 1:
                        J[7 * j:7 * j + 7, 7 * (j + 1):7 * (j + 1) + 7] = Cc[j]
                lu = spl.splu(J.tocsc())
                slow = False
            else:
                F = residual(y, yd, condv, kin)
            delta = lu.solve(-F.reshape(-1)).reshape(nx, 7)
            y = y + delta
            iters = it + 1
            scale = np.maximum(np.abs(y), TYP[None, :])
            if np.max(np.abs(delta) / scale) < 1e-7:
                break
        slow = iters >= 4
        y_nm1, h_prev = y_n, h
    return y


# ---------------------------------------------------------------------------
# mode "batched": lanes-style trailing batch, TPU-engine iteration schedule
# ---------------------------------------------------------------------------
def block_thomas_factor_batched(A, B, C):
    """Factor the block-tridiagonal system for reuse. Blocks (nx,7,7,Bt).
    Returns (Binv_hat list, C) for forward elimination w/ stored inverses."""
    nx = A.shape[0]
    Bt = A.shape[-1]
    # move batch first for np.linalg: (nx, Bt, 7, 7)
    At = np.moveaxis(A, -1, 1); Btm = np.moveaxis(B, -1, 1)
    Ct = np.moveaxis(C, -1, 1)
    Binv = np.empty_like(Btm)
    W = np.empty_like(Btm)  # Binv_hat @ C
    eye = np.broadcast_to(np.eye(7), (Bt, 7, 7))

    def safe_inv(M):
        # diverged lanes (prior-edge kinetics -> overflow/NaN/singular, the
        # TPU engine's FLOW_SANE sentinel case) get an identity block so the
        # batch solve proceeds; their flows come out as garbage = failed.
        bad = ~np.isfinite(M).all((-2, -1))
        M = np.where(bad[:, None, None], eye, M)
        try:
            return np.linalg.inv(M)
        except np.linalg.LinAlgError:
            out = np.empty_like(M)
            for i in range(M.shape[0]):
                try:
                    out[i] = np.linalg.inv(M[i])
                except np.linalg.LinAlgError:
                    out[i] = np.eye(7)
            return out

    Binv[0] = safe_inv(Btm[0])
    W[0] = Binv[0] @ Ct[0]
    for j in range(1, nx):
        Bhat = Btm[j] - At[j] @ W[j - 1]
        Binv[j] = safe_inv(Bhat)
        W[j] = Binv[j] @ Ct[j]
    return At, Binv, W


def block_thomas_apply(fact, rhs):
    At, Binv, W = fact
    nx = At.shape[0]
    r = np.moveaxis(rhs, -1, 1)[..., None]  # (nx, Bt, 7, 1)
    g = np.empty_like(r)
    g[0] = Binv[0] @ r[0]
    for j in range(1, nx):
        g[j] = Binv[j] @ (r[j] - At[j] @ g[j - 1])
    x = np.empty_like(g)
    x[-1] = g[-1]
    for j in range(nx - 2, -1, -1):
        x[j] = g[j] - W[j] @ x[j + 1]
    return np.moveaxis(x[..., 0], 1, -1)


def solve_batched(condv, kin, dts, nx):
    """condv (11, Bt), kin (8, Bt); returns final states (nx, 7, Bt).
    Fixed iteration schedule mirroring the TPU engine (PERF.md 'DAE march
    cost model'): factor + 2 Newton on stride-6 steps and the 6-step dense
    tail, 1 reuse iteration elsewhere."""
    y = initial_guess(condv[:11], nx, trailing=(condv.shape[1],))
    y_nm1 = y.copy()
    h_prev = dts[0]
    fact = None
    cj_f = 1.0
    n_steps = len(dts)
    for k, h in enumerate(dts):
        r = 0.0 if k == 0 else h / h_prev
        alpha = (1.0 + 2.0 * r) / (1.0 + r)
        const = -(1.0 + r) * y + (r * r / (1.0 + r)) * y_nm1
        y_n = y.copy()
        do_factor = (k % 6 == 0) or (k >= n_steps - 6)
        for it in range(2 if do_factor else 1):
            yd = (alpha * y + const) / h
            if do_factor and it == 0:
                A, B, Cc, F = fd_blocks_batched(y, yd, condv, kin, alpha / h)
                B[0] += A[0]; A[0] = 0.0
                B[-1] += Cc[-1]; Cc[-1] = 0.0
                fact = block_thomas_factor_batched(A, B, Cc)
                cj_f = alpha / h
                c = 1.0
            else:
                F = residual(y, yd, condv, kin)
                # IDA's stale-factor compensation (the TPU engine's reuse
                # step, ops/dae_fast.py: c = 2/(1 + cj/cj_factored))
                c = 2.0 / (1.0 + (alpha / h) / cj_f)
            y = y + c * block_thomas_apply(fact, -F)
        y_nm1, h_prev = y_n, h
    return y


def outlet_flows(y):
    C_out, u_out = y[-1, :5], y[-1, 6]
    return C_out * u_out * AREA * 60.0 * R_GAS * 298.0 / P_STP * 1e6


def _condv_table(n_conditions, nx):
    """(11, n): [T_jacket, u_in, void, dz, P0, C_in(5), T_in] from the repo's
    synthetic condition table (identical numbers to the TPU run)."""
    from smc_tpu.models.methanation import make_condition_table
    c = make_condition_table(n_conditions, nx=nx)
    g = lambda a: np.asarray(a, np.float64)
    return np.concatenate([
        g(c.T_jacket)[None], g(c.u_in)[None], g(c.void)[None],
        g(c.dz)[None], g(c.P0)[None], g(c.C_in).T, g(c.T_in)[None]])


def _draw_kins(n, seed=0):
    from smc_tpu.models.methanation import methanation_prior
    pr = methanation_prior(tuple(range(8)))
    rng = np.random.default_rng(seed)
    lo, hi = np.asarray(pr.low, float), np.asarray(pr.high, float)
    k = lo + rng.random((n, 8)) * (hi - lo)
    k[0] = KIN_TRUE  # first particle at truth (the check particle)
    return k


def _oracle_flows(condv, nx, n_steps, growth):
    """Repo blocked-oracle outlet flows at the truth (jax CPU, f32)."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from smc_tpu.models.methanation import (outlet_flows as of,
                                            solve_condition)
    dts = jnp.asarray(geometric_schedule(75.0, n_steps, growth),
                      jnp.float32)
    kin = jnp.asarray(KIN_TRUE, jnp.float32)
    solve = jax.jit(lambda y0, cv: of(solve_condition(y0, cv, kin, dts)))
    outs = []
    for i in range(condv.shape[1]):
        cv = jnp.asarray(condv[:5, i], jnp.float32)
        y0 = jnp.asarray(initial_guess(condv[:11, i], nx), jnp.float32)
        outs.append(np.asarray(solve(y0, cv)))
    return np.stack(outs, 1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="batched",
                    choices=["particle", "batched", "xla"])
    ap.add_argument("--particles", type=int, default=4)
    ap.add_argument("--conditions", type=int, default=30)
    ap.add_argument("--nx", type=int, default=51)
    ap.add_argument("--n-steps", type=int, default=48)
    ap.add_argument("--growth", type=float, default=1.28)
    ap.add_argument("--check", action="store_true",
                    help="compare truth-particle outlet flows vs the repo "
                         "blocked oracle (adds a jax CPU compile)")
    args = ap.parse_args()

    # This is a CPU benchmark: force the CPU backend before any device use
    # (and never touch the TPU — one TPU process at a time, CLAUDE.md).
    import jax
    jax.config.update("jax_platforms", "cpu")

    condv = _condv_table(args.conditions, args.nx)
    dts = geometric_schedule(75.0, args.n_steps, args.growth)
    kins = _draw_kins(args.particles)

    check = None
    t0 = time.perf_counter()
    if args.mode == "particle":
        flows = []
        for p in range(args.particles):
            f = []
            for i in range(args.conditions):
                try:
                    f.append(outlet_flows(solve_particle(
                        condv[:11, i], kins[p], dts, args.nx)))
                except (np.linalg.LinAlgError, RuntimeError,
                        FloatingPointError):
                    # failed solve -> sentinel (the reference's -10000 /
                    # errorbox path, methanation_set_likelihood.py:244)
                    f.append(np.full(5, -10000.0))
            flows.append(np.stack(f, 1))
        elapsed = time.perf_counter() - t0
        truth_flows = flows[0]
    elif args.mode == "batched":
        # batch = particles x conditions on the trailing axis (lanes layout)
        P, NC = args.particles, args.conditions
        cv = np.repeat(condv[:, None, :], P, 1).reshape(11, P * NC)
        kk = np.repeat(kins.T[:, :, None], NC, 2).reshape(8, P * NC)
        y = solve_batched(cv, kk, dts, args.nx)
        elapsed = time.perf_counter() - t0
        truth_flows = outlet_flows(y).reshape(5, P, NC)[:, 0]
    else:  # xla
        import jax
        jax.config.update("jax_platforms", "cpu")
        import jax.numpy as jnp
        from smc_tpu.models.methanation import MethanationModel
        model = MethanationModel.default(
            n_conditions=args.conditions, nx=args.nx,
            n_steps=args.n_steps, growth=args.growth,
            particle_chunk=args.particles)
        ll_fn = jax.jit(lambda th: model.log_likelihood(th)[0])
        th = jnp.asarray(
            np.concatenate([kins, np.full((args.particles, 1), 5.0)], 1)
            [:, list(model.est_idx)], jnp.float32)
        ll_fn(th).block_until_ready()  # compile (excluded)
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            ll_fn(th).block_until_ready()
        elapsed = (time.perf_counter() - t0) / reps
        truth_flows = None

    check_mean = check_abs = None
    if args.check and truth_flows is not None:
        oracle = _oracle_flows(condv, args.nx, args.n_steps, args.growth)
        denom = np.maximum(np.abs(oracle), 1.0)
        rel = np.abs(truth_flows - oracle) / denom
        check = float(rel.max())
        check_mean = float(rel.mean())
        check_abs = float(np.abs(truth_flows - oracle).max())

    pps = args.particles / elapsed
    print(json.dumps({
        "mode": args.mode, "n_particles": args.particles,
        "n_conditions": args.conditions, "nx": args.nx,
        "elapsed_s": round(elapsed, 3),
        "particles_per_s": round(pps, 4),
        "solves_per_s": round(pps * args.conditions, 2),
        "check_max_rel": check, "check_mean_rel": check_mean,
        "check_max_abs_sccm": check_abs}))


if __name__ == "__main__":
    main()
