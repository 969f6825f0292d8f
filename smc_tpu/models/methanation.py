"""Methanation tubular-reactor model (the reference's flagship application).

Physics being rebuilt (reference files, NOT ported — the implementation here
is vectorized stencils + an on-device implicit integrator):

- LHHW kinetic rate law ``func_rCH4`` (methanation_set_likelihood.py:44-58):
  CO2 + 4 H2 <-> CH4 + 2 H2O over 8 Arrhenius parameters
  (Af, Eaf, Ar, Ear, BCO2, dHCO2, BH2O, dHH2O).
- Ideal-gas mixture density ``func_rohg`` (:61-66).
- Method-of-lines DAE ``reaction`` (:69-139): 7 fields x NX=51 grid points
  (5 species concentrations, temperature T, velocity u); species
  convection-dispersion-reaction balances, total-mass and energy balances;
  inlet rows pin the IC (dX=0 / u=u_in), outlet rows are zero-gradient.
  Reference quirks replicated exactly: the first interior point (i=1) uses a
  one-sided second difference for species dispersion, carries the transient
  total-mass term and an unscaled energy accumulation (interior points scale
  it by 0.1), and the last-row boundary conditions for T and u are swapped
  between the two blocks (:130-137) — row permutations within the outlet
  block, harmless to the solution.
- Observation: outlet standard-state flows in sccm (:204-208; note the
  T/P factors cancel algebraically: F = C_out * u_out * S * 60 * R * 298 /
  P_stp * 1e6) and outlet mole fractions (:220-229).
- Gaussian log-likelihood over the 5 species flows WITHOUT the 2*pi constant
  (my_loglike :280-299): -(0.5/sigma^2) * sum r^2 - n_data * log(sigma).
- Solver-failure containment: failed solves produce flow sentinel -10000
  so the particle is killed by likelihood (:234-254). Here "failure" is a
  non-finite final state from the fixed-iteration Newton march.
- Subset estimation (C19, SMC_methanation_main.py:126 +
  methanation_functions.py:80): the particle holds only the estimated
  parameters; the rest stay at base values.
- Uniform priors from use_params +- use_params * k multipliers
  (methanation_set_conditon.py:61-70).

Data caveat: the reference loads ``methanation_data/information.csv`` which
is ABSENT from its repo (SURVEY.md §6) — its methanation mains cannot run.
We therefore ship a deterministic synthetic condition-table generator with
lab-plausible ranges, and generate observations from the true parameters +
noise exactly like the reference's "artificial data" branch
(SMC_methanation_main.py:86-107).
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from smc_tpu.ops.dae import geometric_schedule, implicit_euler_dae
from smc_tpu.priors import Prior

# ---- physical constants (methanation_set_conditon.py:73-89) ---------------
SC = (-4.0, -1.0, 1.0, 2.0, 0.0)   # stoichiometry (H2, CO2, CH4, H2O, Ar)
DZ_DISP = 0.95e-5                  # axial dispersion, m^2/s
RHOS = 5075.0                      # catalyst density, kg/m^3
HR = -164940.0                     # reaction enthalpy, J/mol
R_GAS = 8.3144589                  # J/mol/K
RR = 0.01 / 2                      # reactor radius, m
AREA = float(np.pi * RR ** 2)      # cross-section, m^2
CPG = 2800.0                       # gas heat capacity, J/kg/K
CPS = 698.0                        # catalyst heat capacity, J/kg/K
KEFF = 0.72                        # effective conductivity, W/m/K
DINT = 0.005                       # internal diameter, m
U_HT = 68.2480                     # wall heat-transfer coeff, W/m^2/K
P_STP = 1.013e5                    # Pa
MOLW = (2.0, 44.0, 16.0, 18.0, 40.0)

# True parameters (methanation_set_conditon.py:55-57).
KIN_TRUE = (13.04, 52.2e3, 1.147e5, 96.7e3, 23.34, -6.0, 0.72, -2.51e3)
SIGMA_TRUE = 5.0
PARAM_NAMES = ("Af", "Eaf", "Ar", "Ear", "BCO2", "dHCO2", "BH2O", "dHH2O",
               "sigma")
# Prior bound multipliers (methanation_set_conditon.py:64-65).
HIGH_K = (25.0, 1.0, 30.0, 2.0, 1.0, -2.0, 1.0, -2.0, 2.0)
LOW_K = (4.0, 1.0, 4.0, 1.0, 1.0, -2.0, 1.0, -2.0, 0.9)
# Default estimated subset (methanation_set_conditon.py:19).
EST_DEFAULT = (0, 1, 2, 3, 8)

NX = 51

# Flow-sanity bound for the failure sentinel: physical outlet flows are
# O(10^2) sccm (bounded by the inlet totals), but the fixed-iteration
# Newton march has no internal error exit like SUNDIALS — at extreme
# kinetic draws it can diverge to FINITE garbage (measured up to ~1e18
# sccm at prior-edge draws, benchmarks/probe_steady.py) that an
# isfinite-only check would silently pass into the likelihood. Anything
# past this bound is a failed solve (reference behavior: IDA error ->
# -10000 sentinel, methanation_set_likelihood.py:244).
FLOW_SANE = 1e6


def rate_rCH4(T, Ca, Cb, Cc, Cd, kin):
    """LHHW methanation rate, mol/(m^3 s) (func_rCH4)."""
    PH2 = Ca * R_GAS * T * 1e-6
    PCO2 = Cb * R_GAS * T * 1e-6
    PCH4 = Cc * R_GAS * T * 1e-6
    PH2O = Cd * R_GAS * T * 1e-6
    kf = kin[0] * jnp.exp(-kin[1] / (R_GAS * T))
    ks = kin[2] * jnp.exp(-kin[3] / (R_GAS * T))
    kCO2 = kin[4] * jnp.exp(-kin[5] / (R_GAS * T))
    kH2O = kin[6] * jnp.exp(-kin[7] / (R_GAS * T))
    rf = 5075e3 * kf * kCO2 * PCO2 * jnp.maximum(0.001, PH2) ** 0.5 \
        / (1.0 + kCO2 * PCO2) ** 2
    rr = 5075e3 * ks * kH2O * PH2O * PCH4 ** 2 / (1.0 + kH2O * PH2O) ** 2
    return rf - rr


def gas_density(C, T, P0):
    """Ideal-gas mixture density, kg/m^3 (func_rohg). C: (..., 5)."""
    mw = jnp.asarray(MOLW, C.dtype)
    return P0 / (R_GAS * T) * jnp.sum(C * mw, -1) / jnp.sum(C, -1) * 1e-3


# ---------------------------------------------------------------------------
# Condition table
# ---------------------------------------------------------------------------
@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Conditions:
    """Per-experiment operating conditions (derived quantities precomputed;
    replaces the information.csv load + unit conversions,
    methanation_set_conditon.py:137-214)."""
    C_in: jnp.ndarray      # (n, 5) inlet concentrations, mol/m^3
    T_in: jnp.ndarray      # (n,) K
    T_jacket: jnp.ndarray  # (n,) K
    u_in: jnp.ndarray      # (n,) m/s
    void: jnp.ndarray      # (n,)
    dz: jnp.ndarray        # (n,) m  (= length / (NX-1))
    P0: jnp.ndarray        # (n,) Pa (total pressure = sum(C_in) R T_in)

    @property
    def n_data(self) -> int:
        return self.T_in.shape[0]

    def select(self, idx) -> "Conditions":
        return jax.tree_util.tree_map(lambda x: x[jnp.asarray(idx)], self)

    # -- CSV interchange (C15 equivalent: the reference's information.csv
    #    loader + unit conversions, methanation_set_conditon.py:137-214;
    #    that file is absent from the reference repo, so this defines a
    #    clean documented schema instead of its 30-column positional one) --
    CSV_HEADER = ("T_jacket_C,T_in_C,P_gauge_MPa,f_h2_sccm,f_co2_sccm,"
                  "f_ch4_sccm,f_h2o_sccm,f_ar_sccm,void_frac,length_mm")

    @staticmethod
    def from_csv(path: str, nx: int = 51) -> "Conditions":
        """Load operating conditions from CSV (header above); performs the
        same unit conversions as the reference loader: deg-C -> K, total
        sccm -> inlet velocity at (T, P), gauge MPa -> absolute Pa, per-
        species flow fractions -> inlet concentrations."""
        raw = np.genfromtxt(path, delimiter=",", names=True)
        raw = np.atleast_1d(raw)
        tj = raw["T_jacket_C"] + 273.0
        t_in = raw["T_in_C"] + 273.0
        p_abs = raw["P_gauge_MPa"] * 1e6 + 101325.0
        flows = np.stack([raw["f_h2_sccm"], raw["f_co2_sccm"],
                          raw["f_ch4_sccm"], raw["f_h2o_sccm"],
                          raw["f_ar_sccm"]], axis=1)
        tot = flows.sum(1)
        u_in = tot * 1.667e-8 / AREA * (101325.0 * t_in) / (p_abs * 298.0)
        c_in = (p_abs / (R_GAS * t_in))[:, None] * flows / tot[:, None]
        dz = (raw["length_mm"] / 1000.0) / (nx - 1)
        f32 = lambda x: jnp.asarray(x, jnp.float32)
        return Conditions(C_in=f32(c_in), T_in=f32(t_in), T_jacket=f32(tj),
                          u_in=f32(u_in), void=f32(raw["void_frac"]),
                          dz=f32(dz),
                          P0=f32(c_in.sum(1) * R_GAS * t_in))

    @staticmethod
    def from_reference_csv(path: str, datalist=None, nx: int = 51):
        """Adapter for the reference's 30-column positional
        ``information.csv`` layout (methanation_set_conditon.py:137-215;
        the file itself is absent from the reference repo, so this reader is
        built from the loader's column indices): col 4 reactor length (mm),
        col 5 T_jacket (degC), col 6 void fraction, col 7 T_in (degC),
        col 9 total pressure (gauge MPa), cols 10,11,12,14,15 inlet flows
        H2/CO2/CH4/H2O/Ar (sccm), col 16 total inlet flow, cols
        17,18,19,21,22 measured outlet flows (sccm), cols 24,25,26,28,29
        outlet mole fractions. Empty cells are treated as 0 (the loader's
        ``fillna(0)``).

        ``datalist`` selects experiment rows BY INDEX. (Deviation: the
        reference computes ``iloc[datalist[0]:datalist[-1]+1]`` — a
        contiguous slice, silently ignoring the interior of its own
        datalist; here the listed rows are selected, the evident intent.)

        Returns (Conditions, obs_flows (5, n), obs_molfractions (5, n)).
        """
        raw = np.genfromtxt(path, delimiter=",", skip_header=1,
                            filling_values=0.0)
        # genfromtxt still yields NaN for empty cells (filling_values only
        # covers flagged missing tokens); the reference does fillna(0).
        raw = np.nan_to_num(np.atleast_2d(raw), nan=0.0)
        if datalist is not None:
            raw = raw[np.asarray(datalist)]
        t_jacket = raw[:, 5] + 273.0
        t_in = raw[:, 7] + 273.0
        p_abs = raw[:, 9] * 1e6 + 101325.0
        flows_in = raw[:, (10, 11, 12, 14, 15)]
        tot = raw[:, 16]
        u_in = tot * 1.667e-8 / AREA * (101325.0 * t_in) / (p_abs * 298.0)
        c_in = (p_abs / (R_GAS * t_in))[:, None] * flows_in \
            / flows_in.sum(1)[:, None]
        dz = (raw[:, 4] / 1000.0) / (nx - 1)
        f32 = lambda x: jnp.asarray(x, jnp.float32)
        cond = Conditions(C_in=f32(c_in), T_in=f32(t_in),
                          T_jacket=f32(t_jacket), u_in=f32(u_in),
                          void=f32(raw[:, 6]), dz=f32(dz),
                          P0=f32(c_in.sum(1) * R_GAS * t_in))
        obs_flows = f32(raw[:, (17, 18, 19, 21, 22)].T)
        obs_molf = f32(raw[:, (24, 25, 26, 28, 29)].T)
        return cond, obs_flows, obs_molf

    def to_csv(self, path: str, nx: int = 51) -> None:
        """Inverse of from_csv (recovers the raw operating quantities)."""
        c = {k: np.asarray(getattr(self, k))
             for k in ("C_in", "T_in", "T_jacket", "u_in", "void", "dz",
                       "P0")}
        p_abs = c["P0"]
        tot_c = c["C_in"].sum(1)
        frac = c["C_in"] / tot_c[:, None]
        tot_sccm = (c["u_in"] * AREA * p_abs * 298.0
                    / (1.667e-8 * 101325.0 * c["T_in"]))
        flows = frac * tot_sccm[:, None]
        rows = np.column_stack([
            c["T_jacket"] - 273.0, c["T_in"] - 273.0,
            (p_abs - 101325.0) / 1e6,
            flows, c["void"], c["dz"] * (nx - 1) * 1000.0])
        np.savetxt(path, rows, delimiter=",", header=self.CSV_HEADER,
                   comments="")


def make_condition_table(n_conditions: int = 30,
                         nx: int = NX,
                         t_jacket_c=(120.0, 180.0),
                         total_sccm=(200.0, 600.0),
                         h2_co2_ratio=(4.0, 5.0),
                         ar_frac=(0.15, 0.40),
                         p_gauge_mpa=(0.0, 0.2),
                         length_mm: float = 150.0,
                         void_frac: float = 0.39,
                         seed: int = 20250205) -> Conditions:
    """Deterministic lab-plausible condition table.

    Conditions sweep jacket temperature, total flow, H2:CO2 feed ratio, Ar
    dilution and pressure on low-discrepancy grids (reproducible; no RNG
    state). Inlet is CH4/H2O-free; T_in = T_jacket (preheated feed).
    The default ranges straddle the light-off curve of the true kinetics
    (CO2 conversion ~0.1-0.99 across the table), so the observations are
    maximally informative about the Arrhenius parameters; H2 is fed in
    stoichiometric excess so full conversion never drives concentrations
    negative (the reference rate law's max(0.001, PH2) guard permits that).
    """
    i = np.arange(n_conditions)
    frac = (i * 0.6180339887) % 1.0  # golden-ratio low-discrepancy sweep
    tj = np.linspace(t_jacket_c[0], t_jacket_c[1], n_conditions) + 273.0
    tot = total_sccm[0] + frac * (total_sccm[1] - total_sccm[0])
    ratio = h2_co2_ratio[0] + ((i * 0.3819660113) % 1.0) * (
        h2_co2_ratio[1] - h2_co2_ratio[0])
    arf = ar_frac[0] + ((i * 0.2360679775) % 1.0) * (ar_frac[1] - ar_frac[0])
    pg = p_gauge_mpa[0] + ((i * 0.7639320225) % 1.0) * (
        p_gauge_mpa[1] - p_gauge_mpa[0])

    react = 1.0 - arf
    f_co2 = tot * react / (1.0 + ratio)
    f_h2 = tot * react * ratio / (1.0 + ratio)
    f_ar = tot * arf
    flows = np.stack([f_h2, f_co2, np.zeros(n_conditions),
                      np.zeros(n_conditions), f_ar], axis=1)  # (n, 5) sccm

    T_in = tj
    P_abs = pg * 1e6 + 101325.0
    # u_in conversion (methanation_set_conditon.py:190,214).
    u_in = tot * 1.667e-8 / AREA * (101325.0 * T_in) / (P_abs * 298.0)
    C_in = (P_abs / (R_GAS * T_in))[:, None] * flows / tot[:, None]
    dz = np.full(n_conditions, (length_mm / 1000.0) / (nx - 1))
    void = np.full(n_conditions, void_frac)
    P0 = C_in.sum(1) * R_GAS * T_in

    f32 = lambda x: jnp.asarray(x, jnp.float32)
    return Conditions(C_in=f32(C_in), T_in=f32(T_in), T_jacket=f32(tj),
                      u_in=f32(u_in), void=f32(void), dz=f32(dz), P0=f32(P0))


# ---------------------------------------------------------------------------
# DAE residual (local rows) and solve
# ---------------------------------------------------------------------------
def _local_rows(y_m, y, y_p, yd, flags, cond_vec, kin):
    """Residual rows for one grid point; block-tridiagonal coupling.

    y_*: (7,) = [Ca..Ce, T, u] at neighbor/current grid points.
    flags: (3,) floats = [is_inlet, is_first_interior, is_outlet].
    cond_vec: (4,) = [T_jacket, u_in, void, dz] + P0 appended -> (5,).
    """
    T_jacket, u_in, void, dz, P0 = (cond_vec[0], cond_vec[1], cond_vec[2],
                                    cond_vec[3], cond_vec[4])
    is_inlet, is_first, is_outlet = flags[0], flags[1], flags[2]

    C_m, T_m, u_m = y_m[:5], y_m[5], y_m[6]
    C, T, u = y[:5], y[5], y[6]
    C_p, T_p = y_p[:5], y_p[5]
    Cd, Td = yd[:5], yd[5]

    sc = jnp.asarray(SC, y.dtype)
    r = rate_rCH4(T, C[0], C[1], C[2], C[3], kin)

    # species balances (one-sided dispersion at the first interior point —
    # methanation_set_likelihood.py:105 vs :115)
    conv = (u * C - u_m * C_m) / dz
    lap = jnp.where(is_first > 0, C_p - C, C_p - 2.0 * C + C_m) / dz ** 2
    res_c = -void * Cd - conv + void * DZ_DISP * lap + (1 - void) * sc * r

    # total-mass balance (T-block row; transient term only at i=1, :110)
    invT_m, invT, invT_p = 1.0 / T_m, 1.0 / T, 1.0 / T_p
    tmb = (-u * P0 * (invT - invT_m) / dz
           - P0 * invT * (u - u_m) / dz
           + void * DZ_DISP * P0 * (invT_p - 2.0 * invT + invT_m) / dz ** 2
           + (1 - void) * R_GAS * (-2.0) * r)
    tmb = tmb + jnp.where(is_first > 0, P0 * void * invT ** 2 * Td, 0.0)

    # energy balance (u-block row; accumulation scaled 0.1 in the interior,
    # unscaled at i=1 — :111 vs :126)
    rho = gas_density(C, T, P0)
    heatcap = void * rho * CPG + (1 - void) * RHOS * CPS
    kappa = jnp.where(is_first > 0, 1.0, 0.1)
    enb = (-kappa * heatcap * Td
           - rho * CPG * (T * u - T_m * u_m) / dz
           + KEFF * (T_p - 2.0 * T + T_m) / dz ** 2
           + (1 - void) * (-HR) * r
           - 2.0 * U_HT / DINT * (T - T_jacket))

    pde_rows = jnp.concatenate([res_c, tmb[None], enb[None]])

    # inlet: dX=0 for concentrations and T, u pinned to u_in (:96-102)
    inlet_rows = jnp.concatenate([Cd, Td[None], (u - u_in)[None]])
    # outlet: zero gradient; note the reference's swapped T/u rows (:130-137)
    outlet_rows = jnp.concatenate(
        [C - C_m, (u - u_m)[None], (T - T_m)[None]])

    rows = jnp.where(is_inlet > 0, inlet_rows,
                     jnp.where(is_outlet > 0, outlet_rows, pde_rows))
    return rows


def _grid_flags(nx: int) -> jnp.ndarray:
    f = np.zeros((nx, 3), np.float32)
    f[0, 0] = 1.0
    f[1, 1] = 1.0
    f[-1, 2] = 1.0
    return jnp.asarray(f)


def initial_guess(cond: Conditions, nx: int = NX) -> jnp.ndarray:
    """(n, nx, 7) initial state: inlet values everywhere, interior T=400
    (SMC_methanation_main.py:47-58)."""
    n = cond.n_data
    y = jnp.zeros((n, nx, 7), jnp.float32)
    y = y.at[:, :, :5].set(cond.C_in[:, None, :])
    y = y.at[:, :, 5].set(400.0)
    y = y.at[:, 0, 5].set(cond.T_in)
    y = y.at[:, :, 6].set(cond.u_in[:, None])
    return y


def solve_condition(y0: jnp.ndarray, cond_vec: jnp.ndarray, kin: jnp.ndarray,
                    dts: jnp.ndarray, newton_iters: int = 3) -> jnp.ndarray:
    """Integrate one condition to t_final; returns final state (nx, 7)."""
    nx = y0.shape[0]
    flags = _grid_flags(nx)

    def rows(y_m, y, y_p, yd, fl):
        return _local_rows(y_m, y, y_p, yd, fl, cond_vec, kin)

    return implicit_euler_dae(rows, y0, flags, dts, newton_iters)


def outlet_flows(y_final: jnp.ndarray, ) -> jnp.ndarray:
    """Outlet standard-state flows (5,) in sccm; the reference's T/P factors
    cancel (methanation_set_likelihood.py:204-208)."""
    C_out = y_final[-1, :5]
    u_out = y_final[-1, 6]
    return C_out * u_out * AREA * 60.0 * R_GAS * 298.0 / P_STP * 1e6


def outlet_molfractions(y_final: jnp.ndarray) -> jnp.ndarray:
    C_out = y_final[-1, :5]
    return C_out / jnp.sum(C_out)


def _rows_bl(Y_m, Y, Y_p, Yd, flags, condv, kin):
    """Batch-last residual: Y_* (7, NX, B); flags (3, NX, 1); condv (5, B)
    = [T_jacket, u_in, void, dz, P0]; kin (8, B). Same physics as
    ``_local_rows`` (see its docstring for reference citations), written so
    every op is elementwise over the flattened particlexcondition batch on
    the lane axis."""
    T_jacket, u_in, void, dz, P0 = condv[0], condv[1], condv[2], condv[3], condv[4]
    is_inlet, is_first, is_outlet = flags[0], flags[1], flags[2]  # (NX, 1)

    C_m, T_m, u_m = Y_m[:5], Y_m[5], Y_m[6]
    C, T, u = Y[:5], Y[5], Y[6]
    C_p, T_p = Y_p[:5], Y_p[5]
    Cd, Td = Yd[:5], Yd[5]

    sc = jnp.asarray(SC, Y.dtype)[:, None, None]
    r = rate_rCH4(T, C[0], C[1], C[2], C[3], kin)        # (NX, B)

    conv = (u * C - u_m * C_m) / dz
    lap = jnp.where(is_first > 0, C_p - C, C_p - 2.0 * C + C_m) / dz ** 2
    res_c = -void * Cd - conv + void * DZ_DISP * lap + (1 - void) * sc * r

    invT_m, invT, invT_p = 1.0 / T_m, 1.0 / T, 1.0 / T_p
    tmb = (-u * P0 * (invT - invT_m) / dz
           - P0 * invT * (u - u_m) / dz
           + void * DZ_DISP * P0 * (invT_p - 2.0 * invT + invT_m) / dz ** 2
           + (1 - void) * R_GAS * (-2.0) * r)
    tmb = tmb + jnp.where(is_first > 0, P0 * void * invT ** 2 * Td, 0.0)

    mw = jnp.asarray(MOLW, Y.dtype)[:, None, None]
    rho = P0 / (R_GAS * T) * jnp.sum(C * mw, 0) / jnp.sum(C, 0) * 1e-3
    heatcap = void * rho * CPG + (1 - void) * RHOS * CPS
    kappa = jnp.where(is_first > 0, 1.0, 0.1)
    enb = (-kappa * heatcap * Td
           - rho * CPG * (T * u - T_m * u_m) / dz
           + KEFF * (T_p - 2.0 * T + T_m) / dz ** 2
           + (1 - void) * (-HR) * r
           - 2.0 * U_HT / DINT * (T - T_jacket))

    pde = jnp.concatenate([res_c, tmb[None], enb[None]], axis=0)
    inlet = jnp.concatenate([Cd, Td[None], (u - u_in)[None]], axis=0)
    outlet = jnp.concatenate([C - C_m, (u - u_m)[None], (T - T_m)[None]],
                             axis=0)
    fl = flags[:, None]  # (3, 1, NX, 1) -> broadcast over (7, NX, B)
    return jnp.where(fl[0] > 0, inlet, jnp.where(fl[2] > 0, outlet, pde))


# Gaussian prior coefficients (std = coeff * |parameter|),
# methanation_set_conditon.py:30; parameters forced uniform in "taylor"
# mode, :27.
NORMAL_COEFF = (0.5, 0.5, 0.5, 0.5, 0.3, 0.3, 0.3, 0.3, 0.5)
UNI_LIST = (0, 1, 2, 3, 8)


def _analytic_CD_jac(flags, condv, pad_cols: int = 0):
    """Closed-form y_p (slot 2) and yd (slot 3) Jacobian blocks of
    ``_rows_bl`` — these slots appear only linearly (dispersion/conduction
    stencils and mass terms), so handing them to ``bdf_march_bl`` halves its
    linearize tangent passes. Cross-checked against the tangent-built blocks
    in tests/test_methanation.py. pad_cols appends zero block columns
    (sublane alignment for the Pallas factor kernel) at assembly time."""
    is_inlet, is_first, is_outlet = flags[0], flags[1], flags[2]  # (NX, 1)
    void, dz, P0 = condv[2], condv[3], condv[4]

    def jac(y_m, y, y_p, yd):
        nf, nx, bt = y.shape
        T, T_p, C = y[5], y_p[5], y[:5]
        pde = (1.0 - is_inlet) * (1.0 - is_outlet)        # (NX, 1)
        zeros = jnp.zeros((nf, nf + pad_cols, nx, bt), y.dtype)

        disp = pde * void * DZ_DISP / dz ** 2             # (NX, B)
        Cb = zeros
        for k in range(5):
            Cb = Cb.at[k, k].set(disp)
        Cb = Cb.at[5, 5].set(-disp * P0 / (T_p * T_p))
        Cb = Cb.at[6, 5].set(pde * KEFF / dz ** 2 * jnp.ones_like(disp))

        mw = jnp.asarray(MOLW, y.dtype)[:, None, None]
        rho = P0 / (R_GAS * T) * jnp.sum(C * mw, 0) / jnp.sum(C, 0) * 1e-3
        heatcap = void * rho * CPG + (1 - void) * RHOS * CPS
        kappa = jnp.where(is_first > 0, 1.0, 0.1)

        Db = zeros
        for k in range(5):
            Db = Db.at[k, k].set(is_inlet - pde * void)
        Db = Db.at[5, 5].set(is_inlet
                             + pde * is_first * P0 * void / (T * T))
        Db = Db.at[6, 5].set(pde * (-kappa * heatcap))
        return {2: Cb, 3: Db}

    return jac


def _analytic_full_jac(flags, condv, kin, pad_cols: int = 0):
    """Closed-form Jacobian blocks of ``_rows_bl`` for ALL four argument
    slots (0 = y_m, 1 = y, 2 = y_p, 3 = yd).

    Supplying every slot removes all 14 jax.linearize tangent passes from
    the Jacobian build — the dominant cost of a factored BDF step (the
    reference pays the same cost inside IDA's difference-quotient Jacobian,
    methanation_set_likelihood.py:169ff). The rate-law partials are shared
    by the species/total-mass/energy rows, so the whole build is a handful
    of elementwise expressions per block entry. Every entry is pinned
    against the tangent-built blocks in
    tests/test_methanation.py::test_analytic_jacobian_blocks_match_tangents.
    """
    is_inlet, is_first, is_outlet = flags[0], flags[1], flags[2]  # (NX, 1)
    void, dz, P0 = condv[2], condv[3], condv[4]

    def jac(y_m, y, y_p, yd):
        nf, nx, bt = y.shape
        pde = (1.0 - is_inlet) * (1.0 - is_outlet)      # (NX, 1)
        C, T, u = y[:5], y[5], y[6]
        C_m, T_m, u_m = y_m[:5], y_m[5], y_m[6]
        T_p = y_p[5]
        Td = yd[5]
        invT, invT_m = 1.0 / T, 1.0 / T_m
        ones = jnp.ones((nx, bt), y.dtype)
        zrow = jnp.zeros((nx, bt), y.dtype)

        def asm(entries):
            # One concatenate per block (entries dict (row, col) -> value
            # broadcastable to (nx, bt)) — chained .at[].set scatters into a
            # zeros buffer serialize on TPU and measured ~8% slower.
            # pad_cols zero columns ride along in the same stack (free).
            # Layout note: a scan-major (NX, nf, ncol, B) assembly (grid
            # axis leading, no transpose before the factor scan) was
            # MEASURED SLOWER end-to-end for the default XLA solver
            # (1534 vs 1604 pps) — XLA fuses the rc-major transpose into
            # the scan's consumption for free, while scan-major assembly
            # scatters every entry across sublane-interleaved slabs.
            return jnp.stack([
                jnp.stack([jnp.broadcast_to(entries.get((i, j), zrow),
                                            (nx, bt)).astype(y.dtype)
                           for j in range(nf)] + [zrow] * pad_cols, 0)
                for i in range(nf)], 0)

        # ---- rate-law partials (shared by rows 0-6) ----------------------
        RT6 = R_GAS * T * 1e-6
        PH2, PCO2 = C[0] * RT6, C[1] * RT6
        PCH4, PH2O = C[2] * RT6, C[3] * RT6
        kf = kin[0] * jnp.exp(-kin[1] / (R_GAS * T))
        ks = kin[2] * jnp.exp(-kin[3] / (R_GAS * T))
        kC = kin[4] * jnp.exp(-kin[5] / (R_GAS * T))
        kW = kin[6] * jnp.exp(-kin[7] / (R_GAS * T))
        PH2g = jnp.maximum(0.001, PH2)
        s = PH2g ** 0.5
        # jnp.maximum's tangent routes to the 2nd arg on ties (x >= c).
        guard = (PH2 >= 0.001).astype(y.dtype)
        a, b = kC * PCO2, kW * PH2O
        rf = 5075e3 * kf * a * s / (1.0 + a) ** 2
        rr = 5075e3 * ks * kW * PH2O * PCH4 ** 2 / (1.0 + b) ** 2
        invRT2 = 1.0 / (R_GAS * T * T)
        dr_dC = (
            rf * guard * (0.5 / PH2g) * RT6,                        # H2
            5075e3 * kf * s * kC * (1.0 - a) / (1.0 + a) ** 3 * RT6,  # CO2
            -(5075e3 * ks * kW * PH2O * 2.0 * PCH4
              / (1.0 + b) ** 2) * RT6,                              # CH4
            -(5075e3 * ks * PCH4 ** 2 * kW * (1.0 - b)
              / (1.0 + b) ** 3) * RT6,                              # H2O
        )
        dlnrf_dT = kin[1] * invRT2 + guard * 0.5 * invT \
            + (kin[5] * invRT2 + invT) * (1.0 - a) / (1.0 + a)
        dlnrr_dT = kin[3] * invRT2 + 2.0 * invT \
            + (kin[7] * invRT2 + invT) * (1.0 - b) / (1.0 + b)
        dr_dT = rf * dlnrf_dT - rr * dlnrr_dT

        # ---- density / heat-capacity partials (energy row) ---------------
        mw = jnp.asarray(MOLW, y.dtype)[:, None, None]
        S0, S1 = jnp.sum(C, 0), jnp.sum(C * mw, 0)
        rho = P0 * invT / R_GAS * S1 / S0 * 1e-3
        heatcap = void * rho * CPG + (1 - void) * RHOS * CPS
        kappa = jnp.where(is_first > 0, 1.0, 0.1)
        # d(enb)/d(rho) prefactor: accumulation + convection terms.
        denb_drho = -kappa * void * CPG * Td \
            - CPG * (T * u - T_m * u_m) / dz
        drho_dT = -rho * invT

        sc = jnp.asarray(SC, y.dtype)
        disp = void * DZ_DISP / dz ** 2

        # ---- slot 1: B (d rows / d y) ------------------------------------
        eB = {}
        lap_diag = disp * jnp.where(is_first > 0, -1.0, -2.0)
        for k in range(5):
            diag = -u / dz + lap_diag
            if k < 4:
                diag = diag + (1 - void) * sc[k] * dr_dC[k]
            eB[(k, k)] = pde * diag + is_outlet * ones
            for j in range(4):
                if j != k:
                    eB[(k, j)] = pde * (1 - void) * sc[k] * dr_dC[j]
            eB[(k, 5)] = pde * (1 - void) * sc[k] * dr_dT
            eB[(k, 6)] = pde * (-C[k] / dz)
        # row 5: total-mass balance (outlet: u - u_m).
        for j in range(4):
            eB[(5, j)] = pde * (1 - void) * R_GAS * (-2.0) * dr_dC[j]
        eB[(5, 5)] = pde * (
            u * P0 * invT ** 2 / dz
            + P0 * (u - u_m) * invT ** 2 / dz
            + 2.0 * disp * P0 * invT ** 2
            + (1 - void) * R_GAS * (-2.0) * dr_dT
            - is_first * 2.0 * P0 * void * invT ** 3 * Td)
        eB[(5, 6)] = (pde * (-P0 * (invT - invT_m) / dz - P0 * invT / dz)
                      + is_outlet * ones)
        # row 6: energy balance (outlet: T - T_m; inlet: u - u_in).
        kappa0 = P0 * invT / R_GAS * 1e-3 / S0
        for j in range(5):
            entry = denb_drho * kappa0 * (MOLW[j] - S1 / S0)
            if j < 4:
                entry = entry + (1 - void) * (-HR) * dr_dC[j]
            eB[(6, j)] = pde * entry
        eB[(6, 5)] = (
            pde * (denb_drho * drho_dT - rho * CPG * u / dz
                   - 2.0 * KEFF / dz ** 2 + (1 - void) * (-HR) * dr_dT
                   - 2.0 * U_HT / DINT)
            + is_outlet * ones)
        eB[(6, 6)] = pde * (-rho * CPG * T / dz) + is_inlet * ones
        Bb = asm(eB)

        # ---- slot 0: A (d rows / d y_m) ----------------------------------
        eA = {}
        for k in range(5):
            eA[(k, k)] = (pde * (u_m / dz + disp * (1.0 - is_first))
                          - is_outlet * ones)
            eA[(k, 6)] = pde * (C_m[k] / dz)
        eA[(5, 5)] = pde * (-u * P0 * invT_m ** 2 / dz
                            - disp * P0 * invT_m ** 2)
        eA[(5, 6)] = pde * (P0 * invT / dz) - is_outlet * ones
        eA[(6, 5)] = (pde * (rho * CPG * u_m / dz + KEFF / dz ** 2)
                      - is_outlet * ones)
        eA[(6, 6)] = pde * (rho * CPG * T_m / dz)
        Ab = asm(eA)

        # ---- slots 2 & 3: C and D (linear; same as _analytic_CD_jac) -----
        eC = {(k, k): pde * disp * ones for k in range(5)}
        eC[(5, 5)] = -pde * disp * P0 / (T_p * T_p)
        eC[(6, 5)] = pde * KEFF / dz ** 2 * ones
        Cb = asm(eC)

        eD = {(k, k): (is_inlet - pde * void) * ones for k in range(5)}
        eD[(5, 5)] = is_inlet * ones + pde * is_first * P0 * void * invT ** 2
        eD[(6, 5)] = pde * (-kappa * heatcap)
        Db = asm(eD)
        return {0: Ab, 1: Bb, 2: Cb, 3: Db}

    return jac


def _make_steady_solve(steady_kwargs: dict):
    """custom_vjp-wrapped steady-state solve: the DIFFERENTIABLE flagship
    likelihood path.

    Forward = the SER-PTC march (``ops.dae_fast.steady_march_bl``; its
    while/fori internals need no AD rules). Backward = the implicit-
    function-theorem adjoint at the converged state: with F(y*, kin) = 0,

        dl/dkin = -lambda^T dF/dkin,   Jh^T lambda = dl/dy*,

    i.e. ONE transposed block-tridiagonal solve (the transpose of a block
    tridiag is block tridiag with swapped/shifted blocks) plus one VJP of
    the residual rows w.r.t. the kinetic parameters — no backprop through
    the march, no stored trajectory. This is what the reference's SUNDIALS
    IDA black box structurally cannot provide (its solver is opaque to
    autodiff; methanation_set_likelihood.py:169) and what enables
    gradient-based mutation (cfg ``mutation="mala"``) and MAP optimization
    on the flagship DAE.

    Jh = dF/dy* + D/h_max is the march's own terminal Newton system, NOT
    the bare steady Jacobian: the discretized steady reactor J = dF/dy* is
    numerically SINGULAR (measured cond ~1e18 — a null direction along
    which F is flat; the dynamics pick the realized state). The true
    sensitivity exists (finite differences are stable), which forces the
    solvability condition lambda_null^T dF/dkin = 0 — so the null
    component that makes |lambda| grow linearly in h CANCELS exactly in
    the kin contraction, and the regularized adjoint converges to the
    true gradient as h grows (measured: matches central differences to
    0.2% at h = h_max = 1e6, the march's own terminal mass coefficient;
    pinned by tests/test_methanation_grad.py).

    Failed lanes (yf = NaN from the march's convergence certificate) yield
    NaN adjoints in THEIR lanes only (lanes never mix in the block solves);
    downstream consumers sanitize per-particle (mala_mutation zeroes
    non-finite gradients; the -10000 sentinel already zeroes the value
    path), preserving the never-NaN likelihood invariant.

    The y0 (initial guess) and condv (experiment conditions) cotangents are
    exactly zero: the steady state does not depend on the guess, and the
    conditions are data, not parameters.
    """
    from smc_tpu.ops.dae_fast import (_newton_kit, block_thomas_bl,
                                      steady_march_bl)

    jac_mode = steady_kwargs.get("jac_mode", "full")
    pad = steady_kwargs.get("pad", 0)
    kw = {k: v for k, v in steady_kwargs.items() if k not in ("jac_mode",
                                                              "pad")}

    def _ajac(flags, condv, kin_bl):
        return {"full": lambda: _analytic_full_jac(flags, condv, kin_bl,
                                                   pad_cols=pad),
                "cd": lambda: _analytic_CD_jac(flags, condv, pad_cols=pad),
                "ad": lambda: None}[jac_mode]()

    # flags is an explicit operand (not a closure capture): under jit even
    # constants are staged to tracers, and a tracer captured by the
    # custom_vjp's bwd closure would leak into the later backward trace
    # (UnexpectedTracerError). Its cotangent is defined zero.
    @jax.custom_vjp
    def solve(kin_bl, condv, flags, y0):
        def rows(y_m, y, y_p, yd):
            return _rows_bl(y_m, y, y_p, yd, flags, condv, kin_bl)
        return steady_march_bl(rows, y0,
                               analytic_jac=_ajac(flags, condv, kin_bl),
                               **kw)

    def fwd(kin_bl, condv, flags, y0):
        yf = solve(kin_bl, condv, flags, y0)
        return yf, (kin_bl, condv, flags, yf)

    def bwd(res, ybar):
        kin_bl, condv, flags, yf = res

        def rows(y_m, y, y_p, yd):
            return _rows_bl(y_m, y, y_p, yd, flags, condv, kin_bl)

        # Regularized steady Jacobian Jh = dF/dy + D/h_max at y* — the
        # march's terminal Newton system (alpha=1, const=-y*: yd = 0 at
        # the point, mass term D/h_max regularizes the singular bare J;
        # see docstring), edge-folded consistently with the residual's
        # neighbor shifts; scan layout (NX, 7, 7, B).
        ajac = _analytic_full_jac(flags, condv, kin_bl, pad_cols=0)
        _, _, build_blocks, _, _, _ = _newton_kit(
            rows, yf, True, ajac, "thomas")
        h_max = jnp.asarray(kw.get("h_max", 1e6), yf.dtype)
        A_, B_, C_, _ = build_blocks(yf, 1.0, -yf, h_max)

        # J^T is block-tridiagonal with sub'_i = C_{i-1}^T, diag' = B_i^T,
        # super'_i = A_{i+1}^T (blockwise transpose = swap the two 7-axes).
        def swapT(M):
            return jnp.swapaxes(M, 1, 2)

        zpad = jnp.zeros_like(A_[:1])
        A_T = jnp.concatenate([zpad, swapT(C_)[:-1]], axis=0)
        C_T = jnp.concatenate([swapT(A_)[1:], zpad], axis=0)
        lam = block_thomas_bl(A_T, swapT(B_), C_T,
                              jnp.moveaxis(ybar, 1, 0), pivot=True)

        # kin cotangent: rhs_fn returns -F rows, so pulling lam through it
        # gives -lam^T dF/dkin — exactly dl/dkin.
        def rhs_fn(kin):
            y_m = jnp.concatenate([yf[:, :1], yf[:, :-1]], axis=1)
            y_p = jnp.concatenate([yf[:, 1:], yf[:, -1:]], axis=1)
            Fv = _rows_bl(y_m, yf, y_p, jnp.zeros_like(yf), flags, condv,
                          kin)
            return -jnp.moveaxis(Fv, 1, 0)

        _, pull = jax.vjp(rhs_fn, kin_bl)
        kbar = pull(lam)[0]
        return (kbar, jnp.zeros_like(condv), jnp.zeros_like(flags),
                jnp.zeros_like(yf))

    solve.defvjp(fwd, bwd)
    return solve


def methanation_prior(est_idx=EST_DEFAULT, mode: str = "uniform") -> Prior:
    """Prior over the estimated parameter subset.

    - "uniform" (reference default, normal_pred=False): bounds
      use_params +- use_params * k (methanation_set_conditon.py:61-70).
    - "normal" (normal_pred=True): N(base_i, (coeff_i * |base_i|)^2)
      (SMC_methanation_main.py:150-158).
    - "taylor" (normal_pred + taylor): parameters in UNI_LIST keep the
      uniform prior, the rest are Gaussian (methanation_functions.py:107-119
      — mixed mode; expressed here as one mixed-kind Prior).
    """
    use = np.asarray(KIN_TRUE + (SIGMA_TRUE,))
    hi = use + use * np.asarray(HIGH_K)
    lo = use - use * np.asarray(LOW_K)
    specs = []
    for i in est_idx:
        normal = {"dist": "normal", "mu": float(use[i]),
                  "sigma": float(abs(use[i]) * NORMAL_COEFF[i])}
        uniform = {"dist": "uniform", "low": float(lo[i]),
                   "high": float(hi[i])}
        if mode == "uniform":
            specs.append(uniform)
        elif mode == "normal":
            specs.append(normal)
        elif mode == "taylor":
            specs.append(uniform if i in UNI_LIST else normal)
        else:
            raise ValueError(f"unknown prior mode {mode!r}")
    return Prior.from_specs(specs)


@dataclasses.dataclass(frozen=True)
class MethanationModel:
    """Batched methanation log-likelihood: vmap over particles x conditions
    of the implicit DAE solve (replaces one Ray task per particle running 30
    sequential IDA solves, methanation_functions.py:44-65)."""

    cond: Conditions
    obs: jnp.ndarray                 # (5, n_data) observed flows, sccm
    prior: Prior
    est_idx: Tuple[int, ...] = EST_DEFAULT
    base_params: Tuple[float, ...] = KIN_TRUE + (SIGMA_TRUE,)
    nx: int = NX
    t_final: float = 75.0
    # Solver defaults picked from an accuracy/cost sweep against a
    # 120-step/6-Newton reference at both the true and posterior-edge
    # kinetics: 48 BDF2 steps (growth 1.28) x 2 Newton keep outlet-flow
    # errors <= ~1 sccm (obs noise sigma_true = 5) at ~60% of the cost of
    # the conservative 40x3 schedule. Pivoting in the 7x7 block elimination
    # is off by default - at physical states the blocks are diagonally
    # dominant (verified bitwise-identical), and a rare breakdown at
    # extreme kinetic draws yields inf/nan that the -10000 failure sentinel
    # converts to a rejected particle, exactly like a SUNDIALS failure in
    # the reference.
    n_steps: int = 48
    newton_iters: int = 2
    pivot: bool = False
    growth: float = 1.28
    # IDA-style Jacobian lag (ops/dae_fast.bdf_march_bl jac_stride): after
    # n_dense per-step-factored startup steps, factor the block-Thomas
    # Jacobian once per jac_stride steps and reuse it (BDF predictor + cj
    # compensation); the last dense_tail steps factor per step again — the
    # observable is the final state, and a freshly-factored near-steady
    # tail pins it regardless of mid-march factor staleness. The lagged
    # middle of the dt schedule is made piecewise-constant per block
    # (block sums preserved, so t_final and the step density are
    # unchanged) — the factored mass coefficient is then exact for every
    # reuse step except the first of a block. Defaults from a measured
    # accuracy/cost sweep (benchmarks/sweep_jac_lag.py, one v5e chip):
    # stride 6 / reuse_iters 1 / dense_tail 6 with the full analytic
    # Jacobian gives ~1530 vs 463 particles/s (3.3x, incl. the Thomas-scan
    # unroll in ops/dae_fast.py) with outlet-flow
    # errors vs a 96-step dense reference identical to the per-step
    # factored engine (max ~2.2 sccm over posterior-bulk draws — the
    # shared discretization error, not the lag; obs noise sigma_true = 5).
    # The dense tail is load-bearing: dropping it triples the error.
    # jac_stride=1 disables the lag.
    jac_stride: int = 6
    n_dense: int = 0
    reuse_iters: int = 1
    dense_tail: int = 6
    # Jacobian-block construction: "full" = closed-form blocks for all four
    # slots (no jax.linearize tangent passes at all — at reuse_iters=1 the
    # build is ~40% of a factor step, and "full" measures ~9% faster than
    # "cd" end-to-end); "cd" = analytic y_p/yd blocks + 14 tangent passes
    # for the y_m/y slots (kept as the autodiff cross-check path); "ad" =
    # all 28 passes by linearize.
    jac_mode: str = "full"
    # Linear solver for the Newton updates: "auto"/"thomas" = sequential
    # block-Thomas scan over NX (the measured end-to-end winner);
    # "thomas_pl" = streaming Pallas factor+apply kernels
    # (ops/thomas_pallas.py — win their microbenches but lose ~6% end-to-
    # end to lost fusion at the kernel boundaries, see
    # ops.dae_fast.resolve_solver); "cr" = log-depth block cyclic
    # reduction (same factors reused across modified-Newton/lag
    # iterations; ~2-3x the block FLOPs for ~8x fewer sequential stages —
    # see docs/PERF.md); "babe" = twisted/burn-at-both-ends block-Thomas
    # (both chain halves advance in one lane-stacked scan: half the
    # serial depth at equal FLOPs; requires odd NX — measured 27-34%
    # SLOWER end-to-end on v5e, benchmarks/ab_babe.py + docs/PERF.md;
    # kept as a tested non-default, ops.dae_fast.block_thomas_babe_factor).
    solver: str = "auto"
    # Particles are processed in chunks of (chunk x n_data) simultaneous DAE
    # systems (lax.map over chunks): bounds the live Jacobian working set
    # (4 x 49 x NX x chunk x n_data x 4B) instead of materializing all
    # N x n_data systems at once. 128 measured fastest on one v5e chip,
    # re-confirmed on the round-2 lagged-Jacobian engine (1584/1608 pps
    # vs 1381/1383 at 256; round 1: 816 vs 765 at 256/1024) — 3840 lanes
    # already saturate the VPU; bigger chunks only grow the HBM working
    # set and the factor-reload traffic of reuse sweeps.
    # Lanes per device dispatch of the DAE march (chunk x n_conditions
    # lanes). Measured sweep on one v5e chip (benchmarks/ab_chunk.py,
    # docs/PERF.md): 512 beats the round-2 default 128 by +6% (1,475 vs
    # 1,388 particles/s) — the march is bound by fixed per-scan-iteration
    # costs that a wider lane axis amortizes. Any N works (trailing chunk
    # is padded); peak extra HBM at 512 is ~154 MB of lagged LU factors.
    particle_chunk: int = 512
    # "batch_last": lanes-major engine (ops/dae_fast.py) — the TPU hot path.
    # "blocked": per-system vmap engine (ops/dae.py) — oracle for tests.
    engine: str = "batch_last"
    # march="transient": time-accurate BDF2 to t_final (what IDA computes
    # for the reference). march="steady": per-lane SER pseudo-transient
    # continuation straight to the t->inf steady state
    # (ops/dae_fast.steady_march_bl) — valid because the likelihood reads
    # only the endpoint (methanation_set_likelihood.py:191-233) and the
    # reactor is at steady state well before t_final=75; SER's terminal
    # Newton phase removes the march's time-discretization error
    # entirely. batch_last engine only.
    march: str = "transient"
    ptc_steps: int = 14
    ptc_dt0: float = 0.02
    ptc_growth: float = 6.0
    ptc_floor: float = 2.0
    ptc_lag: int = 2
    ptc_reuse_iters: int = 1
    # Optional 2-D mesh from parallel.mesh.make_mesh(n, n_data): the
    # flattened particle x condition lane axis B is pinned to
    # P(("particles", "data")) — the flattening is particle-major, so the
    # device grid tiles it as (N/n_p particles) x (n_cond/n_d conditions):
    # the condition axis (the reference's per-experiment loop,
    # methanation_functions.py:56) is itself sharded. None = let the SPMD
    # partitioner decide from the caller's shardings.
    lane_mesh: object = None

    @property
    def param_names(self) -> Tuple[str, ...]:
        return tuple(PARAM_NAMES[i] for i in self.est_idx)

    @property
    def _n_dense_eff(self) -> int:
        """Leading per-step-factored steps, rounded up so the lagged middle
        is an exact number of jac_stride blocks."""
        k = self.jac_stride
        n_lag = self.n_steps - self.n_dense - self.dense_tail
        return self.n_dense + n_lag % k

    def _dts(self):
        dts = geometric_schedule(self.t_final, self.n_steps, self.growth)
        if (self.engine == "batch_last" and not self.pivot
                and self.jac_stride > 1):
            # Flatten the lagged middle to piecewise-constant h per block.
            k, nd = self.jac_stride, self._n_dense_eff
            nl = self.n_steps - self.dense_tail
            mid = dts[nd:nl].reshape(-1, k)
            dts = np.concatenate(
                [dts[:nd], np.repeat(mid.mean(1), k).astype(np.float32),
                 dts[nl:]])
        return jnp.asarray(dts)

    def _cond_vecs(self):
        c = self.cond
        return jnp.stack([c.T_jacket, c.u_in, c.void, c.dz, c.P0], axis=1)

    def simulate_flows(self, kin: jnp.ndarray) -> jnp.ndarray:
        """(5, n_data) outlet flows at one kinetic parameter vector, with the
        -10000 failure sentinel applied per condition."""
        if self.engine == "batch_last":
            return self._flows_batch_bl(kin[None])[0]
        y0 = initial_guess(self.cond, self.nx)
        dts = self._dts()
        cv = self._cond_vecs()

        def one(y0_i, cv_i):
            yf = solve_condition(y0_i, cv_i, kin, dts, self.newton_iters)
            return outlet_flows(yf)

        flows = jax.vmap(one)(y0, cv)  # (n_data, 5)
        ok = jnp.all(jnp.isfinite(flows) & (jnp.abs(flows) < FLOW_SANE),
                     axis=1, keepdims=True)
        flows = jnp.where(ok, flows, -10000.0)
        return flows.T

    def simulate_molfractions(self, kin: jnp.ndarray) -> jnp.ndarray:
        """(5, n_data) outlet mole fractions (the reference's second model
        output, methanation_set_likelihood.py:220-229; failure -> 0, :250-254).
        Kept for parity plots / data_mol artifacts; the likelihood itself is
        on flows, as in the reference."""
        flows = self.simulate_flows(kin)          # sentinel already applied
        ok = jnp.all(flows != -10000.0, axis=0, keepdims=True)
        tot = jnp.sum(jnp.where(ok, flows, 0.0), axis=0, keepdims=True)
        frac = jnp.where(ok & (tot > 0), flows / jnp.where(tot == 0, 1, tot),
                         0.0)
        return frac

    def _flows_batch_bl(self, kin_b: jnp.ndarray) -> jnp.ndarray:
        """Batch-last engine: kin_b (Nc, 8) -> flows (Nc, 5, n_data).

        Flattens particles x conditions onto one lane axis B = Nc * n_data
        (particle-major) and runs ONE batch-last BDF march for all systems.
        """
        from smc_tpu.ops.dae_fast import bdf_march_bl

        nc = self.cond.n_data
        n = kin_b.shape[0]
        bt = n * nc
        kin_bl = jnp.repeat(kin_b.T, nc, axis=1)           # (8, B)
        condv = jnp.tile(self._cond_vecs().T, (1, n))      # (5, B)
        y0 = initial_guess(self.cond, self.nx)             # (nc, NX, 7)
        y0 = jnp.moveaxis(y0, 0, -1).transpose(1, 0, 2)    # (7, NX, nc)
        y0 = jnp.tile(y0, (1, 1, n))                       # (7, NX, B)
        flags = _grid_flags(self.nx).T[:, :, None]         # (3, NX, 1)

        if self.lane_mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            def pin(x):
                spec = P(*([None] * (x.ndim - 1)
                           + [("particles", "data")]))
                return jax.lax.with_sharding_constraint(
                    x, NamedSharding(self.lane_mesh, spec))

            kin_bl, condv, y0 = pin(kin_bl), pin(condv), pin(y0)

        def rows(y_m, y, y_p, yd):
            return _rows_bl(y_m, y, y_p, yd, flags, condv, kin_bl)

        from smc_tpu.ops.dae_fast import resolve_solver
        solver = resolve_solver(self.solver)
        # Pallas factor path: the analytic jacs emit column-padded blocks
        # directly so no standalone pad copies sit before the kernel.
        pad = 1 if (solver == "thomas_pl" and not self.pivot) else 0
        ajac = {"full": lambda: _analytic_full_jac(flags, condv, kin_bl,
                                                   pad_cols=pad),
                "cd": lambda: _analytic_CD_jac(flags, condv, pad_cols=pad),
                "ad": lambda: None}[self.jac_mode]()
        if self.march == "steady":
            # custom_vjp wrapper: same forward march; gradients via the
            # steady-state implicit-function-theorem adjoint (see
            # _make_steady_solve) — the flagship's differentiable path.
            solve = _make_steady_solve(
                dict(jac_mode=self.jac_mode, pad=pad,
                     n_steps=self.ptc_steps, h0=self.ptc_dt0,
                     grow_cap=self.ptc_growth,
                     grow_floor=self.ptc_floor, lag=self.ptc_lag,
                     reuse_iters=self.ptc_reuse_iters,
                     newton_iters=self.newton_iters,
                     pivot=self.pivot, solver=solver))
            yf = solve(kin_bl, condv, flags, y0)
        else:
            yf = bdf_march_bl(rows, y0, self._dts(),
                              newton_iters=self.newton_iters,
                              pivot=self.pivot,
                              analytic_jac=ajac,
                              jac_stride=self.jac_stride,
                              n_dense=self._n_dense_eff,
                              reuse_iters=self.reuse_iters,
                              dense_tail=self.dense_tail,
                              solver=solver)
        flows = (yf[:5, -1, :] * yf[6, -1, :] * AREA * 60.0 * R_GAS * 298.0
                 / P_STP * 1e6)                            # (5, B)
        flows = flows.reshape(5, n, nc)
        ok = jnp.all(jnp.isfinite(flows) & (jnp.abs(flows) < FLOW_SANE),
                     axis=0, keepdims=True)
        flows = jnp.where(ok, flows, -10000.0)
        return jnp.moveaxis(flows, 1, 0)                   # (Nc, 5, nc)

    def _ll_from_flows(self, flows: jnp.ndarray, sigma: jnp.ndarray):
        """flows (..., 5, n_data), sigma (...,) -> log-lik (...,).
        my_loglike (:280-299): Gaussian without the 2*pi constant."""
        sigma_safe = jnp.maximum(sigma, 1e-12)
        resid = flows - self.obs
        n_data = self.obs.shape[1]
        ll = jnp.sum(-(0.5 / sigma_safe[..., None, None] ** 2) * resid ** 2,
                     axis=(-1, -2)) - 5 * n_data * jnp.log(sigma_safe)
        return jnp.where(jnp.isfinite(ll), ll, -jnp.inf)

    def _loglik_one(self, theta: jnp.ndarray):
        """Oracle path: one particle through the per-system (blocked) engine."""
        full = jnp.asarray(self.base_params, jnp.float32)
        full = full.at[jnp.asarray(self.est_idx)].set(theta)
        kin, sigma = full[:8], full[8]
        flows = self.simulate_flows(kin)
        return self._ll_from_flows(flows, sigma), flows

    def log_likelihood(self, theta: jnp.ndarray):
        """theta (N, n_est) -> (log_lik (N,), flows (N, 5, n_data)).

        batch_last engine: all particles' parameters are scattered into full
        9-vectors (the base-parameter overwrite of C19,
        methanation_functions.py:80) and the flattened particle x condition
        batch runs through one lanes-major BDF march per chunk.
        """
        n = theta.shape[0]
        full = jnp.tile(jnp.asarray(self.base_params, jnp.float32), (n, 1))
        full = full.at[:, jnp.asarray(self.est_idx)].set(theta)
        kin_b, sigma = full[:, :8], full[:, 8]

        if self.engine != "batch_last":
            return jax.vmap(self._loglik_one)(theta)

        chunk = min(self.particle_chunk, n)
        if n == chunk:
            flows = self._flows_batch_bl(kin_b)
        else:
            # Pad the trailing chunk (repeat the last particle) so any N
            # works — e.g. the reference's default N=1000 with chunk 128.
            n_pad = (-n) % chunk
            kin_p = jnp.concatenate(
                [kin_b, jnp.tile(kin_b[-1:], (n_pad, 1))]) if n_pad \
                else kin_b
            kin_c = kin_p.reshape(-1, chunk, 8)
            flows = jax.lax.map(self._flows_batch_bl, kin_c)
            flows = flows.reshape(-1, 5, flows.shape[-1])[:n]
        return self._ll_from_flows(flows, sigma), flows

    # -- construction -------------------------------------------------------
    @staticmethod
    def from_csv(conditions_csv: str, data_csv: str, est_idx=EST_DEFAULT,
                 nx: int = NX, prior_mode: str = "uniform", datalist=None,
                 **solver_kw) -> "MethanationModel":
        """Real-data mode (the reference's commented-out branch,
        SMC_methanation_main.py:61-81): operating conditions from
        conditions.csv (schema: Conditions.CSV_HEADER) and observed outlet
        flows from data.csv ((5, n_data), sccm, no header). ``datalist``
        selects an experiment subset by row index (the reference's datalist,
        methanation_set_conditon.py:45-50)."""
        cond = Conditions.from_csv(conditions_csv, nx=nx)
        obs = np.loadtxt(data_csv, delimiter=",")
        obs = jnp.asarray(np.atleast_2d(obs), jnp.float32)
        if obs.shape != (5, cond.n_data):
            raise ValueError(f"data.csv shape {obs.shape} != (5, "
                             f"{cond.n_data})")
        if datalist is not None:
            cond = cond.select(datalist)
            obs = obs[:, jnp.asarray(datalist)]
        return MethanationModel(
            cond=cond, obs=obs,
            prior=methanation_prior(est_idx, mode=prior_mode),
            est_idx=tuple(est_idx), nx=nx, **solver_kw)

    @staticmethod
    def from_reference_csv(information_csv: str, est_idx=EST_DEFAULT,
                           nx: int = NX, prior_mode: str = "uniform",
                           datalist=None, **solver_kw
                           ) -> "MethanationModel":
        """Build from a file in the reference's information.csv layout
        (Conditions.from_reference_csv), using the measured outlet flows in
        that file as the observations."""
        cond, obs_flows, _ = Conditions.from_reference_csv(
            information_csv, datalist=datalist, nx=nx)
        return MethanationModel(
            cond=cond, obs=obs_flows,
            prior=methanation_prior(est_idx, mode=prior_mode),
            est_idx=tuple(est_idx), nx=nx, **solver_kw)

    @staticmethod
    def default(n_conditions: int = 30, est_idx=EST_DEFAULT,
                key=None, noise: bool = True, nx: int = NX, datalist=None,
                **solver_kw) -> "MethanationModel":
        """Model over the synthetic condition table with observations
        generated from the true parameters + N(0, sigma_true) noise
        (the reference's artificial-data branch,
        SMC_methanation_main.py:86-107). ``datalist`` selects a subset of
        the generated conditions by index — e.g. datalist=(0, 2) reproduces
        the legacy-variant scale (SMC_methanation_data.py:43)."""
        cond = make_condition_table(n_conditions, nx=nx)
        if datalist is not None:
            cond = cond.select(datalist)
            n_conditions = cond.n_data
        model0 = MethanationModel(
            cond=cond, obs=jnp.zeros((5, n_conditions)), prior=methanation_prior(est_idx),
            est_idx=tuple(est_idx), nx=nx, **solver_kw)
        flows_true = model0.simulate_flows(jnp.asarray(KIN_TRUE, jnp.float32))
        if noise:
            if key is None:
                key = jax.random.key(20250205)
            flows_obs = flows_true + SIGMA_TRUE * jax.random.normal(
                key, flows_true.shape)
        else:
            flows_obs = flows_true
        return dataclasses.replace(model0, obs=flows_obs)
