"""Full seawater CO2-system solver (OCMIP co2calc grade).

The reference computes surface CO2 chemistry with the OCMIP `co2calc`
routine: equilibrium constants from the DOE (1994) handbook lineage, the
complete total-alkalinity balance (carbonate + borate + water + phosphate
+ silicate − free H − bisulfate − HF), and a vectorized safeguarded
Newton (`drtsafe`) root solve for [H+] (reference:
src/bec2_driver.F:3801-4133 co2calc_row, :4141-4246 talk_row,
:4249-4382 drtsafe_row).  MARBL carries the same system with a pH seed
persisted across steps (src/marbl_driver.F:679-857).

This is the TPU-first equivalent: everything is a pure full-field
function; the bracketed Newton runs a FIXED number of vectorized
iterations (each a few fused elementwise ops — no data-dependent control
flow, so XLA compiles one static program and the solve fuses into the
surrounding surface-flux kernel).  25 safeguarded iterations from the
closed-form seed reach the reference's 1e-10 tolerance everywhere in the
oceanographic range (bisection alone contracts the pH-5..10 bracket to
<1e-12 in 25 steps; Newton converges far faster near the root).

All constants are the published formulations named in the reference's
comments (Weiss 1974 K0; Weiss & Price 1980 fugacity ff; Millero 1995
K1/K2 [Mehrbach data, seawater scale], KW; Dickson 1990 KB, KS; DOE 1994
K1P/K2P/K3P; Yao & Millero 1995 KSi; Dickson & Riley 1979 KF; Uppström
1974 BT; Morris & Riley 1966 ST; Riley 1965 FT) — published physics that
any implementation must match.  Additions beyond the reference's output
set: CO3/HCO3 concentrations and calcite/aragonite saturation states
(Mucci 1983 Ksp), the standard mCDR monitoring diagnostics.

Units follow the reference: tracer inputs in mmol/m3 (converted
internally to mol/kg with rho_sw = 4.1/3.996 ≈ 1.0261), pCO2 in uatm.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp

RHO_SW = 4.1 / 3.996            # (reference: bec2_driver.F:3814)
MASS_TO_VOL = 1.0e6 * RHO_SW    # mol/kg -> mmol/m3
VOL_TO_MASS = 1.0 / MASS_TO_VOL
T0_KELVIN = 273.16


class CO2Consts(NamedTuple):
    ff: jnp.ndarray     # CO2 solubility incl. fugacity/water-vapor [mol/kg/atm]
    k0: jnp.ndarray     # CO2 solubility (Weiss 1974)
    k1: jnp.ndarray
    k2: jnp.ndarray
    kw: jnp.ndarray
    kb: jnp.ndarray
    ks: jnp.ndarray
    kf: jnp.ndarray
    k1p: jnp.ndarray
    k2p: jnp.ndarray
    k3p: jnp.ndarray
    ksi: jnp.ndarray
    bt: jnp.ndarray     # total borate [mol/kg]
    st: jnp.ndarray     # total sulfate
    ft: jnp.ndarray     # total fluoride


def constants(temp, salt) -> CO2Consts:
    """Equilibrium constants & totals at (SST degC, SSS psu), surface
    pressure (reference: bec2_driver.F:3915-4060)."""
    s = jnp.clip(salt, 1.0e-4, 45.0)
    tk = T0_KELVIN + temp
    tk100 = tk * 1e-2
    tk1002 = tk100 * tk100
    invtk = 1.0 / tk
    dlogtk = jnp.log(tk)
    ion = 19.924 * s / (1000.0 - 1.005 * s)
    ion2 = ion * ion
    sqrtis = jnp.sqrt(ion)
    sqrts = jnp.sqrt(s)
    s15 = s * sqrts
    s2 = s * s
    scl = s / 1.80655

    ff = jnp.exp(-162.8301 + 218.2968 / tk100 + 90.9241 * jnp.log(tk100)
                 - 1.47696 * tk1002
                 + s * (0.025695 - 0.025225 * tk100 + 0.0049867 * tk1002))
    k0 = jnp.exp(93.4517 / tk100 - 60.2409 + 23.3585 * jnp.log(tk100)
                 + s * (0.023517 - 0.023656 * tk100 + 0.0047036 * tk1002))
    k1 = 10.0 ** (-(3670.7 * invtk - 62.008 + 9.7944 * dlogtk
                    - 0.0118 * s + 0.000116 * s2))
    k2 = 10.0 ** (-(1394.7 * invtk + 4.777 - 0.0184 * s + 0.000118 * s2))
    kb = jnp.exp((-8966.90 - 2890.53 * sqrts - 77.942 * s
                  + 1.728 * s15 - 0.0996 * s2) * invtk
                 + (148.0248 + 137.1942 * sqrts + 1.62142 * s)
                 + (-24.4344 - 25.085 * sqrts - 0.2474 * s) * dlogtk
                 + 0.053105 * sqrts * tk)
    k1p = jnp.exp(-4576.752 * invtk + 115.525 - 18.453 * dlogtk
                  + (-106.736 * invtk + 0.69171) * sqrts
                  + (-0.65643 * invtk - 0.01844) * s)
    k2p = jnp.exp(-8814.715 * invtk + 172.0883 - 27.927 * dlogtk
                  + (-160.340 * invtk + 1.3566) * sqrts
                  + (0.37335 * invtk - 0.05778) * s)
    k3p = jnp.exp(-3070.75 * invtk - 18.141
                  + (17.27039 * invtk + 2.81197) * sqrts
                  + (-44.99486 * invtk - 0.09984) * s)
    ksi = jnp.exp(-8904.2 * invtk + 117.385 - 19.334 * dlogtk
                  + (-458.79 * invtk + 3.5913) * sqrtis
                  + (188.74 * invtk - 1.5998) * ion
                  + (-12.1652 * invtk + 0.07871) * ion2
                  + jnp.log(1.0 - 0.001005 * s))
    kw = jnp.exp(-13847.26 * invtk + 148.9652 - 23.6521 * dlogtk
                 + (118.67 * invtk - 5.977 + 1.0495 * dlogtk) * sqrts
                 - 0.01615 * s)
    ks = jnp.exp(-4276.1 * invtk + 141.328 - 23.093 * dlogtk
                 + (-13856.0 * invtk + 324.57 - 47.986 * dlogtk) * sqrtis
                 + (35474.0 * invtk - 771.54 + 114.723 * dlogtk) * ion
                 - 2698.0 * invtk * ion * sqrtis + 1776.0 * invtk * ion2
                 + jnp.log(1.0 - 0.001005 * s))
    kf = jnp.exp(1590.2 * invtk - 12.641 + 1.525 * sqrtis
                 + jnp.log(1.0 - 0.001005 * s)
                 + jnp.log(1.0 + (0.1400 / 96.062) * scl / ks))
    bt = 0.000232 * scl / 10.811
    st = 0.14 * scl / 96.062
    ft = 0.000067 * scl / 18.9984
    return CO2Consts(ff=ff, k0=k0, k1=k1, k2=k2, kw=kw, kb=kb, ks=ks,
                     kf=kf, k1p=k1p, k2p=k2p, k3p=k3p, ksi=ksi,
                     bt=bt, st=st, ft=ft)


def ta_residual(h, dic, ta, pt, sit, c: CO2Consts):
    """Total-alkalinity balance f(H) and df/dH, all in mol/kg
    (reference: bec2_driver.F talk_row:4141-4246 —
    fn = hco3 + 2co3 + borate + oh + hpo4 + 2po4 + silicate
         − hfree − hso4 − hf − h3po4 − ta)."""
    x1 = h
    x2 = x1 * x1
    x3 = x2 * x1
    k12 = c.k1 * c.k2
    k12p = c.k1p * c.k2p
    k123p = k12p * c.k3p
    a = x3 + c.k1p * x2 + k12p * x1 + k123p
    a2 = a * a
    da = 3.0 * x2 + 2.0 * c.k1p * x1 + k12p
    b = x2 + c.k1 * x1 + k12
    b2 = b * b
    db = 2.0 * x1 + c.k1
    cc = 1.0 + c.st / c.ks

    fn = (c.k1 * x1 * dic / b
          + 2.0 * dic * k12 / b
          + c.bt / (1.0 + x1 / c.kb)
          + c.kw / x1
          + pt * k12p * x1 / a
          + 2.0 * pt * k123p / a
          + sit / (1.0 + x1 / c.ksi)
          - x1 / cc
          - c.st / (1.0 + c.ks / (x1 / cc))
          - c.ft / (1.0 + c.kf / x1)
          - pt * x3 / a
          - ta)
    df = ((c.k1 * dic * b - c.k1 * x1 * dic * db) / b2
          - 2.0 * dic * k12 * db / b2
          - c.bt / c.kb / (1.0 + x1 / c.kb) ** 2
          - c.kw / x2
          + pt * k12p * (a - x1 * da) / a2
          - 2.0 * pt * k123p * da / a2
          - sit / c.ksi / (1.0 + x1 / c.ksi) ** 2
          - 1.0 / cc
          + c.st * (1.0 + c.ks / (x1 / cc)) ** (-2) * (c.ks * cc / x2)
          + c.ft * (1.0 + c.kf / x1) ** (-2) * c.kf / x2
          - pt * x2 * (3.0 * a - x1 * da) / a2)
    return fn, df


def solve_h(dic, ta, pt, sit, c: CO2Consts, h_init=None,
            ph_lo: float = 5.0, ph_hi: float = 10.0, iters: int = 25):
    """Vectorized safeguarded Newton for [H+] (total scale, mol/kg) — the
    `drtsafe` analog with a FIXED iteration count so the whole solve is
    one static XLA program (reference: bec2_driver.F:4249-4382).

    Maintains the bracket [x_ph_hi, x_ph_lo]; a Newton step that leaves
    the bracket (or stalls) is replaced by bisection, so convergence is
    guaranteed for any oceanographic input.  h_init seeds Newton (e.g.
    the closed-form carbonate-alkalinity solution); default = bracket
    midpoint in log space."""
    shape = jnp.broadcast_shapes(jnp.shape(dic), jnp.shape(ta),
                                 jnp.shape(c.k1))
    dtype = jnp.result_type(dic, ta, c.k1)
    lo = jnp.full(shape, 10.0 ** (-ph_hi), dtype)   # f(lo) < 0 side
    hi = jnp.full(shape, 10.0 ** (-ph_lo), dtype)
    f_lo, _ = ta_residual(lo, dic, ta, pt, sit, c)
    # orient: residual is decreasing in H (d(TA)/dH < 0), so f(lo) > 0 >
    # f(hi); keep [lo, hi] as the H-interval and track signs explicitly
    if h_init is None:
        h = jnp.sqrt(lo * hi)
    else:
        h = jnp.clip(h_init, lo, hi)

    # one scan-compiled safeguarded-Newton body (differentiable — scan
    # keeps the reverse-mode graph one body long instead of `iters`
    # unrolled transcendental blocks)
    def body(carry, _):
        h, lo, hi = carry
        fn, df = ta_residual(h, dic, ta, pt, sit, c)
        # shrink bracket using the sign of fn relative to f(lo)
        same_side = (fn * f_lo) > 0.0
        lo = jnp.where(same_side, h, lo)
        hi = jnp.where(same_side, hi, h)
        h_newton = h - fn / jnp.where(jnp.abs(df) > 0.0, df, 1.0)
        inside = (h_newton > lo) & (h_newton < hi)
        h = jnp.where(inside, h_newton, 0.5 * (lo + hi))
        return (h, lo, hi), None

    from jax import lax
    (h, _, _), _ = lax.scan(body, (h, lo, hi), None, length=iters)
    return h


class CO2Solution(NamedTuple):
    h: jnp.ndarray          # [H+] total scale [mol/kg]
    ph: jnp.ndarray
    co2star: jnp.ndarray    # [mmol/m3]
    hco3: jnp.ndarray       # [mmol/m3]
    co3: jnp.ndarray        # [mmol/m3]
    pco2: jnp.ndarray       # oceanic pCO2 [uatm]
    omega_ca: jnp.ndarray   # calcite saturation state
    omega_ar: jnp.ndarray   # aragonite saturation state
    k0ff: jnp.ndarray       # solubility ff [mol/kg/atm] for flux formation


def _ksp_mucci(temp, salt):
    """Calcite/aragonite stoichiometric solubility products, Mucci (1983)
    [mol/kg]^2 (surface pressure)."""
    tk = T0_KELVIN + temp
    s = jnp.clip(salt, 1.0e-4, 45.0)
    sqrts = jnp.sqrt(s)
    log10tk = jnp.log10(tk)
    lk_ca = (-171.9065 - 0.077993 * tk + 2839.319 / tk + 71.595 * log10tk
             + (-0.77712 + 0.0028426 * tk + 178.34 / tk) * sqrts
             - 0.07711 * s + 0.0041249 * s * sqrts)
    lk_ar = (-171.945 - 0.077993 * tk + 2903.293 / tk + 71.595 * log10tk
             + (-0.068393 + 0.0017276 * tk + 88.135 / tk) * sqrts
             - 0.10018 * s + 0.0059415 * s * sqrts)
    return 10.0 ** lk_ca, 10.0 ** lk_ar


def co2_system(dic_mmol, ta_mmol, temp, salt, po4_mmol=None, sio3_mmol=None,
               h_init=None, iters: int = 25) -> CO2Solution:
    """Solve the full CO2 system from DIC and total alkalinity
    [mmol/m3], surface T/S; optional phosphate/silicate contributions
    (the reference passes the PO4/SiO3 tracers — bec2_driver.F:448-456).

    Returns concentrations back in mmol/m3 and pCO2 in uatm."""
    c = constants(temp, salt)
    dic = jnp.maximum(dic_mmol, 1.0) * VOL_TO_MASS
    ta = jnp.maximum(ta_mmol, 1.0) * VOL_TO_MASS
    pt = (jnp.maximum(po4_mmol, 0.0) * VOL_TO_MASS
          if po4_mmol is not None else jnp.zeros_like(dic))
    sit = (jnp.maximum(sio3_mmol, 0.0) * VOL_TO_MASS
           if sio3_mmol is not None else jnp.zeros_like(dic))

    h = solve_h(dic, ta, pt, sit, c, h_init=h_init, iters=iters)

    h2 = h * h
    denom = h2 + c.k1 * h + c.k1 * c.k2
    co2star = dic * h2 / denom
    hco3 = dic * c.k1 * h / denom
    co3 = dic * c.k1 * c.k2 / denom
    # oceanic pCO2 via the fugacity-corrected solubility, as the
    # reference outputs it (bec2_driver.F:4104-4110 pco2oc = co2star/ff)
    pco2 = co2star / c.ff * 1.0e6

    ksp_ca, ksp_ar = _ksp_mucci(temp, salt)
    ca = 0.010285 * jnp.clip(salt, 1.0e-4, 45.0) / 35.0   # mol/kg
    omega_ca = ca * co3 / ksp_ca
    omega_ar = ca * co3 / ksp_ar

    return CO2Solution(h=h, ph=-jnp.log10(h),
                       co2star=co2star * MASS_TO_VOL,
                       hco3=hco3 * MASS_TO_VOL,
                       co3=co3 * MASS_TO_VOL,
                       pco2=pco2,
                       omega_ca=omega_ca, omega_ar=omega_ar,
                       k0ff=c.ff)


def co2_flux(dic_mmol, ta_mmol, temp, salt, kw_piston, pco2_air_uatm,
             po4_mmol=None, sio3_mmol=None, atm_pres: float = 1.0,
             h_init=None, iters: int = 25):
    """Air-sea CO2 flux [mmol/m2/s, positive into the ocean] from the
    full-system solve: FG = kw * (co2star_air - co2star_oc) with
    co2star_air = xco2 * ff * atmpres (reference: bec2_driver.F:4094-4101
    dco2star; flux formation at :457-470)."""
    sol = co2_system(dic_mmol, ta_mmol, temp, salt, po4_mmol, sio3_mmol,
                     h_init=h_init, iters=iters)
    co2star_air = (pco2_air_uatm * 1.0e-6) * sol.k0ff * atm_pres \
        * MASS_TO_VOL
    return kw_piston * (co2star_air - sol.co2star), sol
