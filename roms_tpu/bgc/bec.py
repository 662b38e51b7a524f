"""Reduced-BEC ecosystem at reference tracer counts.

Two registered variants built from one parameterized kernel:

  * ``bec2``   — the 29-tracer BEC2 + Ncycle_SY tracer set of the
    reference's built-in ecosystem (reference: src/bec2_driver.F
    ecosys_bec2_tile, tracer table tests/CDR_parameterized/tracers.opt,
    indices src/bgc_tracers_indx.opt, counts src/param.opt:26-30);
  * ``marbl32`` — the 32-tracer MARBL-standard set the reference couples
    through libmarbl (reference: src/marbl_driver.F:1210-1329, nt
    src/param.opt:31-32, ALK/DIC indices marbl_driver.F:1940-1964).

The science is a reduced (but conservative and fully coupled) BEC-style
model: three phytoplankton functional groups (small phyto with CaCO3,
diatoms with Si, diazotrophs that fix N) each carrying C/Chl/Fe(/Si/P)
pools, one zooplankton, semi-labile + refractory DOM pools, O2, full
carbonate system (DIC/ALK with closed-form equilibrium chemistry and
air-sea CO2/O2 exchange driven by pco2_air forcing), iron with dust/iron
deposition and scavenging, and the Ncycle NH4->NO2->NO3 nitrification +
suboxic denitrification chain producing N2O/N2 (reference: Ncycle_SY in
cppdefs, bec2_driver.F).  Particulate export runs through ballast-model
sinking pools (POC with N/P/Fe riders, CaCO3, SiO2): soft + hard
sub-fractions with per-class dissolution length scales and sea-floor
remineralization (reference: the P_* sinking particulate types,
src/bec2_vars.F:100-140) — column integrals of N/P/Si/Fe/C are exactly
conserved by the interior terms.  The rate kernel also emits the
registered diagnostic set (production/remin/flux/nitrogen-transformation
rates + surface carbonate/gas-exchange fields) consumed by the
bgc_io-style diagnostics writer (roms_tpu/io/bgc_io.py; reference:
src/bgc_io.F + the bec2 diag registration in bec2_vars.F).

Everything is a pure full-field function (nbgc, nz, jy, ix) -> tendencies;
XLA fuses it into the tracer corrector — the TPU-first replacement for the
reference's per-column loops.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from roms_tpu.bgc.api import BGCContext, BGCModel, register

# ---- tracer sets ----------------------------------------------------------

BEC2_TRACERS = (
    "PO4", "NO3", "SiO3", "NH4", "Fe", "O2", "DIC", "Alk",
    "DOC", "DON", "DOFE", "DOP", "DOPR", "DONR",
    "ZOOC", "SPC", "SPCHL", "SPFE", "SPCACO3",
    "DIATC", "DIATCHL", "DIATFE", "DIATSI",
    "DIAZC", "DIAZCHL", "DIAZFE",
    "NO2", "N2", "N2O")

MARBL_TRACERS = (
    "PO4", "NO3", "SiO3", "NH4", "Fe", "Lig", "O2",
    "DIC", "DIC_ALT_CO2", "ALK", "ALK_ALT_CO2",
    "DOC", "DON", "DOP", "DOPr", "DONr", "DOCr",
    "zooC", "spChl", "spC", "spP", "spFe", "spCaCO3",
    "diatChl", "diatC", "diatP", "diatFe", "diatSi",
    "diazChl", "diazC", "diazP", "diazFe")

# ---- stoichiometry & rates (BEC lineage values, reference:
# src/bec2_params.F) --------------------------------------------------------
Q_CN = 16.0 / 117.0        # mol N / mol C (Redfield, BEC C117)
Q_CP = 1.0 / 117.0         # mol P / mol C
Q_FE = 3.0e-6              # mol Fe / mol C
Q_SI = 0.137               # mol Si / mol C (diatoms)
O2_PER_C = 1.45            # mol O2 per mol C fixed
DAY = 86400.0

PAR_FRAC = 0.45
KPAR = 0.04                # extra chl shading handled via swr_frac only
RHO0_CP = 1027.5 * 3985.0

# per-group parameters: (mu_max [1/d], alpha_chl, kNO3, kNH4, kPO4, kFe,
# kSiO3, theta_max [mg Chl/mmol C], loss [1/d], agg [1/(mmol C/m3 d)])
GROUPS = {
    "sp":   (3.0, 0.35, 0.25, 0.01, 0.01, 0.03e-3, 0.0, 2.5, 0.12, 0.01),
    "diat": (3.3, 0.28, 0.50, 0.05, 0.05, 0.06e-3, 1.0, 3.0, 0.12, 0.02),
    "diaz": (1.2, 0.39, 1.00, 0.15, 0.02, 0.04e-3, 0.0, 2.5, 0.15, 0.01),
}
GRAZE_MAX = {"sp": 3.3, "diat": 3.15, "diaz": 1.2}    # [1/d]
K_GRAZE = 1.05              # [mmol C/m3]
Z_EFF = 0.3                 # zoo growth efficiency
Z_LOSS = 0.1                # zoo linear loss [1/d]
Z_LOSS2 = 0.4               # zoo quadratic loss [1/(mmol C/m3 d)]
DOM_FRAC = 0.34             # routed to semi-labile DOM
DOC_REMIN = 1.0 / 100.0     # [1/d] semi-labile DOM remin
DOR_REMIN = 1.0 / 10000.0   # [1/d] refractory
DOR_FRAC = 0.02             # fraction of remin routed to refractory pools
POC_LENGTH = 120.0          # [m] implicit particulate remin e-scale
CACO3_FRAC = 0.07           # CaCO3 production / sp photosynthesis
CACO3_LENGTH = 600.0        # [m] CaCO3 dissolution length
CACO3_DISS = 1.0 / 30.0     # [1/d] of the SPCACO3 pool
FE_SCAV = 1.0 / 180.0       # [1/d] free-iron scavenging
DUST_TO_FE = 0.035 * 1.0e6 / 55.85  # kg dust/m2/s -> mmol Fe/m2/s (3.5% Fe)
NITRIF1 = 1.0 / 15.0        # NH4 -> NO2 [1/d]
NITRIF2 = 1.0 / 7.0         # NO2 -> NO3 [1/d]
PAR_NITRIF_INHIB = 1.0      # W/m2 threshold (photoinhibition)
O2_SUBOXIC = 4.0            # [mmol/m3]
DENITR = 1.0 / 20.0         # suboxic NO3->NO2->N2O->N2 chain [1/d]
N2O_YIELD = 0.06
LIG_PROD = 5.0e-5           # ligand production per remin C
LIG_LOSS = 1.0 / 1000.0     # [1/d]
Q10 = 1.7
EPS = 1.0e-30


def _tfunc(temp):
    return Q10 ** ((temp - 30.0) / 10.0)


def _par(ctx: BGCContext, forc: Optional[dict]):
    """PAR [W/m2] at rho levels from the model's penetrative solar profile;
    the DAILYPAR variants use the low-frequency swrad climatology when
    present (reference: bgc.opt nc_swrad_avg / DAILYPAR_*)."""
    if forc is not None and "swrad_LFreq" in forc:
        sw = forc["swrad_LFreq"][None]          # already W/m2
    else:
        sw = ctx.srflx[None] * RHO0_CP
    frac_r = 0.5 * (ctx.swr_frac[1:] + ctx.swr_frac[:-1])
    return PAR_FRAC * jnp.maximum(sw, 0.0) * frac_r


# ---- carbonate system ------------------------------------------------------

def _co2_equilibrium(dic, alk, temp, salt):
    """Closed-form seawater CO2 system: given DIC and carbonate alkalinity,
    solve the K1/K2 equilibrium for [H+], pCO2 (the reduction of the
    reference's iterative solvers, bec2 co2calc / MARBL; constants:
    Weiss 1974 K0, Lueker et al. 2000 K1/K2).

    dic/alk in mmol/m3; temp degC; salt PSU.  Returns (pco2 [ppm=uatm],
    ph, co2star [mmol/m3])."""
    tk = temp + 273.15
    tk100 = tk / 100.0
    s = jnp.clip(salt, 1.0, 45.0)
    lnk0 = (-60.2409 + 93.4517 / tk100 + 23.3585 * jnp.log(tk100)
            + s * (0.023517 - 0.023656 * tk100 + 0.0047036 * tk100 ** 2))
    k0 = jnp.exp(lnk0)                       # mol/kg/atm
    pk1 = (3633.86 / tk - 61.2172 + 9.6777 * jnp.log(tk)
           - 0.011555 * s + 0.0001152 * s * s)
    pk2 = (471.78 / tk + 25.929 - 3.16967 * jnp.log(tk)
           - 0.01781 * s + 0.0001122 * s * s)
    k1 = 10.0 ** (-pk1)
    k2 = 10.0 ** (-pk2)

    # mmol/m3 -> mol/kg (rho ~ 1025)
    c = dic * 1.0e-3 / 1025.0
    # carbonate alkalinity ~ 96% of total alkalinity (borate correction)
    a = jnp.maximum(alk * 1.0e-3 / 1025.0 * 0.96, 1.0e-6)
    c = jnp.maximum(c, 1.0e-6)

    # CA = [HCO3] + 2[CO3]; DIC = [CO2*] + [HCO3] + [CO3]
    # with x = [H+]: standard quadratic (Follows et al. 2006)
    g = c / a
    disc = ((1.0 - g) * (1.0 - g) * k1 * k1
            - 4.0 * k1 * k2 * (1.0 - 2.0 * g))
    h = 0.5 * ((g - 1.0) * k1 + jnp.sqrt(jnp.maximum(disc, 0.0)))
    h = jnp.maximum(h, 1.0e-12)
    co2star = c * h * h / (h * h + k1 * h + k1 * k2)  # mol/kg
    pco2 = co2star / k0 * 1.0e6                        # uatm
    ph = -jnp.log10(h)
    return pco2, ph, co2star * 1025.0 * 1.0e3          # mmol/m3


def o2_saturation(temp, salt):
    ts = jnp.log(jnp.clip((298.15 - temp) / (273.15 + temp), 1e-6, None))
    a = (2.00907 + 3.22014 * ts + 4.05010 * ts ** 2 + 4.94457 * ts ** 3
         - 0.256847 * ts ** 4 + 3.88767 * ts ** 5)
    b = salt * (-6.24523e-3 - 7.37614e-3 * ts - 1.03410e-2 * ts ** 2
                - 8.17083e-3 * ts ** 3) - 4.88682e-7 * salt * salt
    return jnp.exp(a + b) * 44.6596  # ml/L fit -> umol/L = mmol/m3


# Wanninkhof-style wind-speed-dependent gas transfer (reference:
# bec2_driver.F:107 a=8.6e-7 s/m = 0.31 cm/hr per (m/s)^2; XKW = a*ws^2 at
# :194; PV = XKW * sqrt(660/Sc))
XKW_COEFF = 8.6e-7   # [s/m]
SC_REF = 660.0


def schmidt_o2(temp):
    """Schmidt number of O2(SST) (reference: bec2_driver.F CSCHMIDT_O2,
    Keeling et al. 1998)."""
    return 1638.0 + temp * (-81.83 + temp * (1.483 + temp * (-0.008004)))


def schmidt_co2(temp):
    """Schmidt number of CO2(SST) (reference: bec2_driver.F CSCHMIDT_CO2,
    Wanninkhof 1992)."""
    return 2073.1 + temp * (-125.62 + temp * (3.6276 + temp * (-0.043219)))


def wind_speed_from_stress(sustr_r, svstr_r, rho0):
    """10 m wind speed from the kinematic stress at rho points: invert
    ustar^2 = ws*(c1 + ws*(c2 + ws*c3)) with 3 Newton iterations from a
    constant-Cd guess (reference: bec2_driver.F:3228-3322 WS())."""
    rho_air = 1.2
    c1, c2, c3, cd = 0.0027, 0.000142, 0.0000764, 1.7e-3
    ust2 = jnp.sqrt(sustr_r ** 2 + svstr_r ** 2) * rho0 / rho_air
    ws = jnp.sqrt(ust2 / cd)
    for _ in range(3):
        f = ws * (c1 + ws * (c2 + ws * c3)) - ust2
        fp = c1 + ws * (2.0 * c2 + ws * 3.0 * c3)
        ws = ws - f / jnp.maximum(fp, 1e-12)
    return jnp.maximum(ws, 0.0)


def gas_transfer_velocity(ws, schmidt):
    """Piston velocity kw = a*ws^2*sqrt(660/Sc) [m/s]."""
    return XKW_COEFF * ws * ws * jnp.sqrt(
        SC_REF / jnp.maximum(schmidt, 1.0))


# ---- sinking particulate pools (ballast model) -----------------------------
#
# The reference's BEC carries per-column implicit particulate types —
# POC, P_CaCO3, P_SiO2, dust, P_iron — each with soft (freely dissolving)
# and hard (ballast-protected) sub-pools, tracking prod / remin /
# sflux_in / hflux_in per level (reference: src/bec2_vars.F:100-140 sinking
# particulate declarations; Armstrong et al. 2002 ballast model as used by
# Moore et al. 2004).  Here each class is a two-fraction exponential
# attenuation column solve: the soft fraction remineralizes with the
# class's dissolution length, the hard fraction sinks with an effectively
# conservative length and remineralizes at the sea floor.  Exactly
# conservative per column.  Reduction vs the reference (documented): the
# POC hard fraction is a fixed parameter rather than dynamically tied to
# the ballast mineral fluxes.

# (soft dissolution length [m], hard fraction, hard length [m])
# (reference: bec2_params BEC lineage / Moore et al. 2004 Table 2)
PART_POC = (130.0, 0.03, 40000.0)
PART_CACO3 = (600.0, 0.55, 40000.0)
PART_SIO2 = (220.0, 0.37, 40000.0)
PART_DUST = (600.0, 0.97, 40000.0)


def _attenuation_column(prod, hz, length):
    """Downward flux + per-cell absorption of one sinking sub-pool.

    prod: (nz, ..) volumetric production [conc/s], k=0 bottom.  Returns
    (remin (nz,..) [conc*m/s per cell, NOT yet divided by hz],
     flux (nz+1,..) downward flux at W-interfaces, flux[nz]=0 at surface,
     f_bot (..) flux through the sea floor)."""
    def step(f_above, xs):
        p, dz = xs
        f_below = (f_above + p * dz) * jnp.exp(-dz / length)
        return f_below, ((f_above + p * dz) - f_below, f_below)

    f_bot, (remin_rev, flux_rev) = jax.lax.scan(
        step, jnp.zeros_like(prod[0]), (prod[::-1], hz[::-1]))
    remin = remin_rev[::-1]
    # flux at W-interfaces: interface k = bottom of cell k; top = 0
    flux = jnp.concatenate([flux_rev[::-1], jnp.zeros_like(prod[:1])],
                           axis=0)
    return remin, flux, f_bot


def particulate_flux(prod, hz, klass):
    """Two-fraction ballast-model column solve for one particulate class.

    Returns (remin [conc/s per cell], flux_w (nz+1,..) total downward
    interface flux [conc*m/s], f_bot (..) sea-floor flux — which is also
    already remineralized into the bottom cell of `remin`, keeping the
    column integral of remin equal to that of prod)."""
    soft_len, hard_frac, hard_len = klass
    r_s, f_s, b_s = _attenuation_column(prod * (1.0 - hard_frac), hz,
                                        soft_len)
    r_h, f_h, b_h = _attenuation_column(prod * hard_frac, hz, hard_len)
    remin = r_s + r_h
    f_bot = b_s + b_h
    remin = remin.at[0].add(f_bot)        # sea-floor remineralization
    return remin / jnp.maximum(hz, 1e-12), f_s + f_h, f_bot


def _sinking_remin(loss_c, hz, length):
    """Single-exponential column remineralization (kept for the CaCO3
    in-group dissolution path and backward compatibility); exactly
    conservative like `particulate_flux`."""
    remin, _, f_bot = _attenuation_column(loss_c, hz, length)
    remin = remin.at[0].add(f_bot)
    return remin / jnp.maximum(hz, 1e-12)


def make_interior(names: Tuple[str, ...]):
    idx = {n.upper(): i for i, n in enumerate(names)}
    has = lambda n: n.upper() in idx
    I = lambda n: idx[n.upper()]
    ncycle = has("NO2")
    marbl = has("LIG")

    def kernel(trc, ctx: BGCContext, saved, forc=None):
        """Shared rate kernel: returns (tendencies, diagnostics dict).
        The diagnostics (production/remineralization/flux/transformation
        rates, reference: the registered bec2 diag set bec2_vars.F +
        bgc_io.F) cost nothing on the plain tendency path — XLA dead-code
        -eliminates unused outputs."""
        T = jnp.maximum
        get = lambda n: T(trc[I(n)], 0.0)
        po4, no3, sio3, nh4, fe = (get("PO4"), get("NO3"), get("SiO3"),
                                   get("NH4"), get("Fe"))
        o2, dic, alk = get("O2"), get("DIC"), get("ALK")
        doc, don, dop = get("DOC"), get("DON"), get("DOP")
        zoo = get("ZOOC")
        tf = _tfunc(ctx.temp)
        par = _par(ctx, forc)

        d = jnp.zeros_like(trc)
        diags = {"PAR": par}

        def add(n, v):
            nonlocal d
            d = d.at[I(n)].add(v)

        photo_tot = jnp.zeros_like(po4)     # total C fixation [mmolC/m3/s]
        no3_up = jnp.zeros_like(po4)
        nh4_up = jnp.zeros_like(po4)
        nfix = jnp.zeros_like(po4)
        graze_tot = jnp.zeros_like(po4)
        loss_poc = jnp.zeros_like(po4)      # -> implicit particulates
        loss_pon = jnp.zeros_like(po4)
        loss_pop = jnp.zeros_like(po4)
        loss_pofe = jnp.zeros_like(po4)
        loss_posi = jnp.zeros_like(po4)
        dom_c = jnp.zeros_like(po4)

        for g in ("sp", "diat", "diaz"):
            cn = {"sp": "SPC", "diat": "DIATC", "diaz": "DIAZC"}[g]
            chn = {"sp": "SPCHL", "diat": "DIATCHL", "diaz": "DIAZCHL"}[g]
            fen = {"sp": "SPFE", "diat": "DIATFE", "diaz": "DIAZFE"}[g]
            (mu0, alpha, kno3, knh4, kpo4, kfe, ksi, th_max, mort,
             agg) = GROUPS[g]
            c = get(cn)
            chl = get(chn)
            cfe = get(fen)

            # nutrient limitation (Liebig minimum, BEC style)
            vno3 = (no3 / kno3) / (1.0 + no3 / kno3 + nh4 / knh4)
            vnh4 = (nh4 / knh4) / (1.0 + no3 / kno3 + nh4 / knh4)
            vn = vno3 + vnh4
            if g == "diaz":
                vn_eff = jnp.ones_like(vn)   # N2 fixation covers N
            else:
                vn_eff = vn
            vp = po4 / (kpo4 + po4)
            vfe = fe / (kfe + fe)
            lims = [vn_eff, vp, vfe]
            if g == "diat":
                lims.append(sio3 / (ksi + sio3))
            vtot = lims[0]
            for L in lims[1:]:
                vtot = jnp.minimum(vtot, L)

            theta = chl / T(c, EPS)          # mg Chl / mmol C
            mu_max = mu0 / DAY * tf
            pcmax = mu_max * vtot
            light = 1.0 - jnp.exp(-alpha / DAY * theta * par
                                  / T(pcmax, 1e-12))
            mu = pcmax * light               # [1/s]
            photo = mu * c
            photo_tot = photo_tot + photo
            diags[f"photoC_{g}"] = photo

            # chlorophyll synthesis toward a light-regulated theta
            theta_t = th_max / (1.0 + alpha * theta * par
                                / T(2.0 * pcmax * DAY, 1e-12))
            chl_syn = mu * c * theta_t
            add(chn, chl_syn - mort / DAY * tf * chl)

            # N source split
            if g == "diaz":
                nfix = nfix + photo * Q_CN
            else:
                wno3 = vno3 / T(vn, 1e-12)
                no3_up = no3_up + photo * Q_CN * wno3
                nh4_up = nh4_up + photo * Q_CN * (1.0 - wno3)

            # grazing (Holling III on each group)
            gr = (GRAZE_MAX[g] / DAY * tf * zoo
                  * c * c / (K_GRAZE * K_GRAZE + c * c))
            # mortality + aggregation
            mo = mort / DAY * tf * c + agg / DAY * c * c
            add(cn, photo - gr - mo)
            graze_tot = graze_tot + gr
            # chl and Fe pools follow their carbon ratio losses
            add(chn, -(gr + mo) * theta)
            qfe = cfe / T(c, EPS)
            fe_up = photo * Q_FE
            add(fen, fe_up - (gr + mo) * qfe)
            add("FE", -fe_up)
            loss_pofe = loss_pofe + ((1.0 - DOM_FRAC) * (1.0 - Z_EFF) * gr
                                     + (1.0 - DOM_FRAC) * mo) * qfe

            # route losses: DOM + implicit particulates
            # non-assimilated grazing (1-Z_EFF) and mortality split
            # DOM_FRAC : (1-DOM_FRAC) between DOM and sinking particles
            dom_c = dom_c + DOM_FRAC * (mo + (1.0 - Z_EFF) * gr)
            loss_poc = loss_poc + (1.0 - DOM_FRAC) * mo \
                + (1.0 - DOM_FRAC) * (1.0 - Z_EFF) * gr

            if g == "diat":
                qsi = get("DIATSI") / T(c, EPS)
                si_up = photo * Q_SI
                add("DIATSI", si_up - (gr + mo) * qsi)
                add("SIO3", -si_up)
                loss_posi = loss_posi + (gr + mo) * qsi
            if g == "sp" and has("SPCACO3"):
                caco3_prod = CACO3_FRAC * photo
                qca = get("SPCACO3") / T(c, EPS)
                diss = CACO3_DISS / DAY * get("SPCACO3")
                add("SPCACO3", caco3_prod - (gr + mo) * qca - diss)
                add("DIC", -caco3_prod + diss)
                add("ALK", -2.0 * caco3_prod + 2.0 * diss)
                # grazed/dead CaCO3 sinks through the ballast-model
                # particulate column (reference: P_CaCO3, bec2_vars.F)
                ca_loss = (gr + mo) * qca
                ca_remin, ca_flux, ca_bot = particulate_flux(
                    ca_loss, ctx.hz, PART_CACO3)
                add("DIC", ca_remin)
                add("ALK", 2.0 * ca_remin)
                diags["CaCO3_prod"] = caco3_prod
                diags["CaCO3_remin"] = ca_remin + diss
                diags["CaCO3_flux"] = ca_flux
                diags["CaCO3_bot_flux"] = ca_bot

        # zooplankton
        z_mort = Z_LOSS / DAY * tf * zoo + Z_LOSS2 / DAY * zoo * zoo
        add("ZOOC", Z_EFF * graze_tot - z_mort)
        dom_c = dom_c + DOM_FRAC * z_mort
        loss_poc = loss_poc + (1.0 - DOM_FRAC) * z_mort
        loss_pon = loss_pon + loss_poc * Q_CN
        loss_pop = loss_pop + loss_poc * Q_CP

        # DOM production & remineralization
        remin_doc = DOC_REMIN / DAY * tf * doc
        remin_don = DOC_REMIN / DAY * tf * don
        remin_dop = DOC_REMIN / DAY * tf * dop
        add("DOC", dom_c - remin_doc)
        add("DON", dom_c * Q_CN - remin_don)
        add("DOP", dom_c * Q_CP - remin_dop)
        if has("DOFE"):
            dofe = get("DOFE")
            remin_dofe = DOC_REMIN / DAY * tf * dofe
            add("DOFE", dom_c * Q_FE - remin_dofe)
            add("FE", remin_dofe)
        # refractory pools
        for lab, ref_n, q in (("DOC", "DOCR", 1.0), ("DON", "DONR", Q_CN),
                              ("DOP", "DOPR", Q_CP)):
            if has(ref_n):
                ref = get(ref_n)
                remin_ref = DOR_REMIN / DAY * tf * ref
                add(ref_n, DOR_FRAC * dom_c * q - remin_ref)
                add(lab, -DOR_FRAC * dom_c * q)
                if ref_n == "DOCR":
                    add("DIC", remin_ref)
                    add("O2", -remin_ref * O2_PER_C)
                elif ref_n == "DONR":
                    add("NH4", remin_ref)
                else:
                    add("PO4", remin_ref)

        # sinking particulate pools: ballast-model column solves
        # (reference: POC/P_CaCO3/P_SiO2/P_iron types, bec2_vars.F:100-140;
        # N/P/Fe ride the POC class as in the reference)
        remin_poc, poc_flux, poc_bot = particulate_flux(
            loss_poc, ctx.hz, PART_POC)
        remin_pon, _, _ = particulate_flux(loss_pon, ctx.hz, PART_POC)
        remin_pop, _, _ = particulate_flux(loss_pop, ctx.hz, PART_POC)
        remin_pofe, _, _ = particulate_flux(loss_pofe, ctx.hz, PART_POC)
        remin_posi, posi_flux, _ = particulate_flux(
            loss_posi, ctx.hz, PART_SIO2)
        diags["POC_prod"] = loss_poc
        diags["POC_remin"] = remin_poc
        diags["POC_flux"] = poc_flux
        diags["POC_bot_flux"] = poc_bot
        diags["SiO2_prod"] = loss_posi
        diags["SiO2_remin"] = remin_posi
        diags["SiO2_flux"] = posi_flux

        add("SIO3", remin_posi)
        add("FE", remin_pofe - FE_SCAV / DAY * fe)
        diags["Fe_scavenge"] = FE_SCAV / DAY * fe
        if marbl:
            lig = get("LIG")
            add("LIG", LIG_PROD * (remin_poc + remin_doc)
                - LIG_LOSS / DAY * lig)

        # carbon / oxygen bookkeeping
        total_remin_c = remin_poc + remin_doc
        add("DIC", total_remin_c - photo_tot)
        add("O2", O2_PER_C * (photo_tot - total_remin_c))
        diags["photoC_tot"] = photo_tot
        diags["graze_tot"] = graze_tot
        diags["zoo_loss"] = z_mort
        diags["DOC_prod"] = dom_c
        diags["DOC_remin"] = remin_doc
        diags["N_fix"] = nfix
        diags["NO3_uptake"] = no3_up
        diags["NH4_uptake"] = nh4_up

        # nitrogen cycle
        add("NO3", -no3_up)
        add("NH4", -nh4_up + remin_pon + remin_don)
        # alkalinity from N transformations: +1 per NO3 uptake, -1 per NH4
        # uptake/production asymmetry (BEC convention)
        add("ALK", no3_up - (remin_pon + remin_don))
        if ncycle:
            no2 = get("NO2")
            inhib = jnp.exp(-par / PAR_NITRIF_INHIB)
            nit1 = NITRIF1 / DAY * inhib * nh4
            nit2 = NITRIF2 / DAY * inhib * no2
            diags["NITRIF_NH4_NO2"] = nit1
            diags["NITRIF_NO2_NO3"] = nit2
            add("NH4", -nit1)
            add("NO2", nit1 - nit2)
            add("NO3", nit2)
            add("O2", -1.5 * nit1 - 0.5 * nit2)
            add("ALK", -nit1)
            # suboxic denitrification chain
            sub = jnp.where(o2 < O2_SUBOXIC, 1.0, 0.0)
            den1 = DENITR / DAY * sub * no3
            den2 = DENITR / DAY * sub * no2
            diags["DENITRIF"] = den1 + den2
            diags["N2O_prod"] = 0.5 * N2O_YIELD * den2
            add("NO3", -den1)
            add("NO2", den1 - den2)
            add("N2O", 0.5 * N2O_YIELD * den2)
            add("N2", 0.5 * (1.0 - N2O_YIELD) * den2)
            add("ALK", den1)
            # N2 fixation draws down dissolved N2 (mmol N2 = 2 N)
            add("N2", -0.5 * nfix)
        else:
            inhib = jnp.exp(-par / PAR_NITRIF_INHIB)
            nit = NITRIF1 / DAY * inhib * nh4
            diags["NITRIF_NH4_NO3"] = nit
            add("NH4", -nit)
            add("NO3", nit)
            add("O2", -2.0 * nit)
            add("ALK", -2.0 * nit)

        # phosphorus closure
        add("PO4", remin_pop + remin_dop - photo_tot * Q_CP)

        # ALT_CO2 mirror tracers share the biological DIC/ALK tendencies
        if has("DIC_ALT_CO2"):
            d = d.at[I("DIC_ALT_CO2")].add(d[I("DIC")])
            d = d.at[I("ALK_ALT_CO2")].add(d[I("ALK")])
        if has("SPP"):
            # explicit per-group P pools (MARBL): slaved to the group's
            # carbon tendency at Redfield (their PO4 exchange is already
            # accounted in the bulk P closure above)
            for cn, pn in (("SPC", "SPP"), ("DIATC", "DIATP"),
                           ("DIAZC", "DIAZP")):
                d = d.at[I(pn)].add(d[I(cn)] * Q_CP)

        d = d * ctx.rmask[None, None]
        # No persisted saved state: the reference carries the previous pH
        # as the seed of MARBL's iterative carbonate solver across restarts
        # (marbl_driver.F:679-857); the closed-form solve used here needs
        # no seed, so restarts carry no extra BGC state.
        return d, diags

    def interior(trc, ctx: BGCContext, saved, forc=None):
        d, _ = kernel(trc, ctx, saved, forc)
        return d, None

    interior.kernel = kernel
    return interior


def make_surface_flux(names: Tuple[str, ...]):
    idx = {n.upper(): i for i, n in enumerate(names)}
    has = lambda n: n.upper() in idx
    I = lambda n: idx[n.upper()]

    def surface_flux(trc, ctx: BGCContext, forc):
        """Air-sea gas exchange (O2, CO2) + atmospheric deposition
        (dust->Fe, iron, NOx->NO3, NHy->NH4) (reference: src/bgc_forces.F,
        bec2_driver gas-exchange sections).  Returns (nbgc, jy, ix)
        kinematic fluxes [conc * m/s], positive into the ocean."""
        nb = trc.shape[0]
        flx = jnp.zeros((nb,) + ctx.srflx.shape, trc.dtype)
        forc = forc or {}
        temp = ctx.temp[-1]
        salt = ctx.salt[-1] if ctx.salt is not None \
            else jnp.full_like(temp, 35.0)

        # wind-speed-dependent piston velocities (reference:
        # bec2_driver.F:194 XKW = a*ws^2, then sqrt(660/Sc) per gas);
        # ws comes from bulk wspd when the case carries it, else from the
        # kinematic stress via the reference's WS() inversion — the stepper
        # injects "wspd" on every path.  A caller that omits it gets ZERO
        # gas exchange (calm-air limit), which is almost never intended
        # from a direct surface_flux call: warn once rather than silently
        # losing the air-sea O2/CO2 fluxes (round-4 advisor finding).
        ws = forc.get("wspd")
        if ws is None:
            import warnings
            warnings.warn(
                "BEC surface_flux called without a 'wspd' forcing entry: "
                "air-sea O2/CO2 gas exchange is ZERO (calm-air limit). "
                "Pass wspd (10 m wind speed, m/s) — the model stepper "
                "injects it automatically; direct callers must supply it "
                "or pass wspd=0 explicitly to silence this warning.",
                stacklevel=2)
            ws = jnp.zeros_like(temp)
        kw_o2 = gas_transfer_velocity(ws, schmidt_o2(temp))
        kw_co2 = gas_transfer_velocity(ws, schmidt_co2(temp))

        o2 = trc[I("O2")][-1]
        o2sat = o2_saturation(temp, salt)
        flx = flx.at[I("O2")].set(kw_o2 * (o2sat - o2))

        # phosphate/silicate alkalinity contributions enter the full
        # solve exactly as the reference passes the PO4/SiO3 tracers to
        # co2calc (reference: bec2_driver.F:448-456)
        po4_s = trc[I("PO4")][-1] if has("PO4") else None
        sio3_s = trc[I("SIO3")][-1] if has("SIO3") else None

        def co2flx(dic_n, alk_n, pco2_key):
            from roms_tpu.bgc.carbonate import co2_flux
            dic = trc[I(dic_n)][-1]
            alk = trc[I(alk_n)][-1]
            pco2_air = forc.get(pco2_key)
            if pco2_air is None:
                pco2_air = jnp.full_like(temp, 420.0)
            # full OCMIP-grade system solve (total alkalinity incl.
            # borate/water/phosphate/silicate; safeguarded Newton),
            # seeded by the closed-form carbonate-alkalinity solution
            _, ph0, _ = _co2_equilibrium(dic, alk, temp, salt)
            fg, _ = co2_flux(dic, alk, temp, salt, kw_co2, pco2_air,
                             po4_mmol=po4_s, sio3_mmol=sio3_s,
                             h_init=10.0 ** (-ph0))
            return fg

        flx = flx.at[I("DIC")].add(co2flx("DIC", "ALK", "pco2_air"))
        if has("DIC_ALT_CO2"):
            flx = flx.at[I("DIC_ALT_CO2")].add(
                co2flx("DIC_ALT_CO2", "ALK_ALT_CO2", "pco2_air_alt"))

        if "dust" in forc:
            flx = flx.at[I("FE")].add(forc["dust"] * DUST_TO_FE * 1.0e-3)
        if "iron" in forc:
            # nmol/cm2/s -> mmol/m2/s = 1e-9 mol/1e-4 m2 = 1e-5 mol/m2/s
            flx = flx.at[I("FE")].add(forc["iron"] * 1.0e-2)
        if "nox" in forc:
            flx = flx.at[I("NO3")].add(forc["nox"] * 1.0e-2)
        if "nhy" in forc:
            flx = flx.at[I("NH4")].add(forc["nhy"] * 1.0e-2)
        return flx * ctx.rmask[None]

    return surface_flux


def make_init_tracers(names: Tuple[str, ...]):
    def init_tracers(cfg, z_r, dtype=jnp.float64):
        import numpy as np
        from roms_tpu.cases.uswc import bgc_profile
        z = np.asarray(z_r, np.float64)
        return jnp.stack([jnp.asarray(bgc_profile(n, z), dtype)
                          for n in names], axis=0)
    return init_tracers


def make_diagnose(names: Tuple[str, ...]):
    """Full diagnostic evaluation: interior rates + surface carbonate /
    gas-exchange fields (reference: the bgc_io.F output set — FG_CO2,
    pCO2, pH, PAR, production/remin/flux rates).  Run at output cadence
    only; returns {name: (nz|nz+1|2D, jy, ix)}."""
    interior0 = make_interior(names)
    idx = {n.upper(): i for i, n in enumerate(names)}
    has = lambda n: n.upper() in idx
    I = lambda n: idx[n.upper()]

    def diagnose(trc, ctx: BGCContext, forc=None):
        _, diags = interior0.kernel(trc, ctx, None, forc)
        forc = forc or {}
        temp = ctx.temp[-1]
        salt = ctx.salt[-1] if ctx.salt is not None \
            else jnp.full_like(temp, 35.0)
        from roms_tpu.bgc.carbonate import co2_flux
        dic = jnp.maximum(trc[I("DIC")][-1], 0.0)
        alk = jnp.maximum(trc[I("ALK")][-1], 0.0)
        ws = forc.get("wspd")
        if ws is None:
            ws = jnp.zeros_like(temp)
        kw_o2 = gas_transfer_velocity(ws, schmidt_o2(temp))
        kw_co2 = gas_transfer_velocity(ws, schmidt_co2(temp))
        o2 = jnp.maximum(trc[I("O2")][-1], 0.0)
        o2sat = o2_saturation(temp, salt)
        pco2_air = forc.get("pco2_air")
        if pco2_air is None:
            pco2_air = jnp.full_like(temp, 420.0)
        # full carbonate system for the monitoring diagnostics (the
        # mCDR-relevant set: pCO2/pH/CO3/saturation states; reference:
        # bgc output of co2calc fields + MARBL's CO3/Omega diags)
        _, ph0, _ = _co2_equilibrium(dic, alk, temp, salt)
        fg_co2, sol = co2_flux(
            dic, alk, temp, salt, kw_co2, pco2_air,
            po4_mmol=trc[I("PO4")][-1] if has("PO4") else None,
            sio3_mmol=trc[I("SIO3")][-1] if has("SIO3") else None,
            h_init=10.0 ** (-ph0))
        diags.update({
            "pCO2_oc": sol.pco2, "pH_surf": sol.ph,
            "CO3_surf": sol.co3, "HCO3_surf": sol.hco3,
            "CO2STAR_surf": sol.co2star,
            "Omega_calcite": sol.omega_ca, "Omega_aragonite": sol.omega_ar,
            "FG_CO2": fg_co2,
            "FG_O2": kw_o2 * (o2sat - o2),
            "O2_saturation": o2sat, "wspd_10m": ws,
        })
        m = ctx.rmask
        return {k: v * (m if v.ndim == 2 else m[None])
                for k, v in diags.items()}

    return diagnose


def _build(name, tracers):
    interior0 = make_interior(tracers)

    def interior(trc, ctx, saved, forc=None):
        return interior0(trc, ctx, saved, forc)

    return BGCModel(
        name=name, tracer_names=tracers,
        interior_tendency=interior,
        surface_flux=make_surface_flux(tracers),
        init_tracers=make_init_tracers(tracers),
        init_saved=lambda cfg, shape, dtype: None,
        diagnose=make_diagnose(tracers))


@register("bec2")
def build_bec2() -> BGCModel:
    return _build("bec2", BEC2_TRACERS)


@register("bec2_base")
def build_bec2_base() -> BGCModel:
    """BEC2 without the Ncycle_SY extension (26 tracers — reference:
    param.opt:26-30 `ntrc_bio=26` when Ncycle_SY is undefined, the
    tests/bgc_real cppdefs_BEC.opt configuration)."""
    return _build("bec2_base", BEC2_TRACERS[:-3])


@register("marbl32")
def build_marbl32() -> BGCModel:
    return _build("marbl32", MARBL_TRACERS)
