"""Reduced-BEC ecosystem tests (reference: src/bec2_driver.F,
src/marbl_driver.F; tracer tables tests/CDR_parameterized/tracers.opt,
src/bgc_tracers_indx.opt).

Element budgets: organic carbon pools carry N/P implicitly at Redfield
(the dissolved organics have explicit DON/DOP/DONR/DOPR pools), so

  C  = DIC + DOC + DOCr + spC + diatC + diazC + zooC + spCaCO3
  N  = NO3 + NH4 [+ NO2 + 2 N2 + 2 N2O] + DON + DONr + Q_CN * org-C
  P  = PO4 + DOP + DOPr + (explicit spP/diatP/diazP or Q_CP * phyto-C)
       + Q_CP * zooC
  Si = SiO3 + diatSi

must be invariant under the interior tendencies (no air-sea terms).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from roms_tpu.bgc import bec
from roms_tpu.bgc.api import BGCContext, get_model

Q_CN = bec.Q_CN
Q_CP = bec.Q_CP


def make_ctx(nz=12, jy=3, ix=3):
    z_w1 = jnp.linspace(-120.0, 0.0, nz + 1)
    z_w = jnp.broadcast_to(z_w1[:, None, None], (nz + 1, jy, ix))
    hz = z_w[1:] - z_w[:-1]
    z_r = 0.5 * (z_w[1:] + z_w[:-1])
    return BGCContext(
        temp=14.0 + 6.0 * jnp.exp(z_r / 50.0),
        salt=jnp.full((nz, jy, ix), 34.0),
        z_r=z_r, z_w=z_w, hz=hz,
        srflx=jnp.full((jy, ix), 200.0 / (1027.5 * 3985.0)),
        swr_frac=jnp.exp(z_w / 15.0), rmask=jnp.ones((jy, ix)),
        dt=600.0, time=jnp.zeros(()))


@pytest.mark.parametrize("name,nb", [("bec2", 29), ("marbl32", 32)])
def test_tracer_sets_and_conservation(name, nb):
    m = get_model(name)
    assert m.ntracers == nb
    ctx = make_ctx()
    trc = m.init_tracers(None, ctx.z_r)
    assert trc.shape[0] == nb
    d, _ = m.interior_tendency(trc, ctx, None, None)
    assert bool(jnp.all(jnp.isfinite(d)))

    I = {n.upper(): i for i, n in enumerate(m.tracer_names)}
    col = (d * ctx.hz[None]).sum(axis=1)
    scale = float(jnp.abs(col).max())

    def s(k):
        return col[I[k]] if k in I else 0.0

    c_tot = (s("DIC") + s("DOC") + s("DOCR") + s("SPC") + s("DIATC")
             + s("DIAZC") + s("ZOOC") + s("SPCACO3"))
    si_tot = s("SIO3") + s("DIATSI")
    n_tot = (s("NO3") + s("NH4") + s("NO2") + 2.0 * s("N2")
             + 2.0 * s("N2O") + s("DON") + s("DONR")
             + Q_CN * (s("SPC") + s("DIATC") + s("DIAZC") + s("ZOOC")))
    if "SPP" in I:
        p_org = s("SPP") + s("DIATP") + s("DIAZP")
    else:
        p_org = Q_CP * (s("SPC") + s("DIATC") + s("DIAZC"))
    p_tot = s("PO4") + s("DOP") + s("DOPR") + p_org + Q_CP * s("ZOOC")

    tol = 1e-12 * max(scale, 1e-30)
    assert float(jnp.abs(c_tot).max()) < tol, "carbon not conserved"
    assert float(jnp.abs(si_tot).max()) < tol, "silicon not conserved"
    assert float(jnp.abs(p_tot).max()) < tol, "phosphorus not conserved"
    if name == "bec2":
        # with the Ncycle chain (incl. the N2 pool), N closes exactly
        assert float(jnp.abs(n_tot).max()) < tol, "nitrogen not conserved"
    else:
        # marbl32 has no N2 tracer: the only N source is N2 fixation
        assert float(jnp.abs(n_tot).max()) < 0.05 * scale


def test_carbonate_chemistry_sanity():
    """pCO2/pH of typical surface seawater (DIC 2050, ALK 2300, 16 degC,
    S 34.5) must land in the observed range."""
    pco2, ph, co2s = bec._co2_equilibrium(
        jnp.asarray(2050.0), jnp.asarray(2300.0),
        jnp.asarray(16.0), jnp.asarray(34.5))
    assert 200.0 < float(pco2) < 700.0
    assert 7.7 < float(ph) < 8.4
    # warming at fixed DIC/ALK raises pCO2
    pco2_w, _, _ = bec._co2_equilibrium(
        jnp.asarray(2050.0), jnp.asarray(2300.0),
        jnp.asarray(22.0), jnp.asarray(34.5))
    assert float(pco2_w) > float(pco2)
    # adding alkalinity at fixed DIC lowers pCO2 (the mCDR premise)
    pco2_a, _, _ = bec._co2_equilibrium(
        jnp.asarray(2050.0), jnp.asarray(2360.0),
        jnp.asarray(16.0), jnp.asarray(34.5))
    assert float(pco2_a) < float(pco2)


def test_o2_saturation_range():
    o2s = bec.o2_saturation(jnp.asarray(15.0), jnp.asarray(34.0))
    assert 220.0 < float(o2s) < 320.0
    # colder water holds more oxygen
    assert float(bec.o2_saturation(jnp.asarray(5.0), jnp.asarray(34.0))) \
        > float(o2s)


def test_surface_fluxes_directions():
    m = get_model("marbl32")
    ctx = make_ctx()
    trc = m.init_tracers(None, ctx.z_r)
    I = {n.upper(): i for i, n in enumerate(m.tracer_names)}
    jyix = ctx.srflx.shape
    forc = {"pco2_air": jnp.full(jyix, 2000.0),      # huge excess -> ingassing
            "pco2_air_alt": jnp.full(jyix, 1.0),     # near-zero -> outgassing
            "wspd": jnp.full(jyix, 7.0),             # Wanninkhof kw(u10)
            "dust": jnp.full(jyix, 6.0e-10),
            "iron": jnp.full(jyix, 1.0e-3),
            "nox": jnp.full(jyix, 8.0e-11),
            "nhy": jnp.full(jyix, 5.0e-11)}
    sf = m.surface_flux(trc, ctx, forc)
    assert bool(jnp.all(sf[I["DIC"]] > 0.0))
    assert bool(jnp.all(sf[I["DIC_ALT_CO2"]] < 0.0))
    assert bool(jnp.all(sf[I["FE"]] > 0.0))
    assert bool(jnp.all(sf[I["NO3"]] > 0.0))
    assert bool(jnp.all(sf[I["NH4"]] > 0.0))
    # O2 flux relaxes toward saturation
    o2 = trc[I["O2"]][-1]
    o2sat = bec.o2_saturation(ctx.temp[-1], ctx.salt[-1])
    sign = jnp.sign(o2sat - o2)
    assert bool(jnp.all(jnp.sign(sf[I["O2"]]) == sign))


def test_bec2_in_full_step():
    """bec2 coupled into the tracer corrector on a tiny periodic domain
    (the nt=31 bgc_real shape: T + S + 29; exercises the batched tracer
    engine at BGC scale)."""
    from roms_tpu.cases import filament
    from roms_tpu.driver import run

    nbgc = 29
    cfg = filament.config(ntimes=2).replace(
        nx=16, ny=16, nz=8, nt=2 + nbgc, salinity=True, nonlin_eos=True,
        bgc_model="bec2", n_bgc=nbgc)
    grid, st, frc = filament.setup(cfg)
    model = get_model("bec2")
    bgc0 = model.init_tracers(cfg, st.z_r)
    # the filament analytic setup fills only temp; build the full stack
    t0 = jnp.concatenate([st.t[:1], jnp.full_like(st.t[:1], 35.0), bgc0])
    st = st.replace(t=t0, t_prev=t0)
    st2, rows = run(grid, st, frc, cfg, nsteps=2)
    assert bool(jnp.all(jnp.isfinite(st2.t)))
    # BGC tracers moved (coupled), stayed in a physical range
    assert not np.allclose(np.asarray(st2.t[2:]), np.asarray(bgc0))
    assert float(st2.t[2 + 1].min()) > -1e-6   # NO3 non-negative-ish


def test_gas_transfer_velocity_wanninkhof():
    """kw = a*u10^2*sqrt(660/Sc) with the reference coefficients
    (reference: bec2_driver.F:107,194 + CSCHMIDT_O2/CO2)."""
    # Schmidt numbers at 20 C (Wanninkhof 1992 table values)
    assert abs(float(bec.schmidt_co2(jnp.asarray(20.0))) - 668.0) < 5.0
    assert abs(float(bec.schmidt_o2(jnp.asarray(20.0))) - 530.0) < 15.0
    # kw at 7 m/s, Sc=660: 8.6e-7*49 = 4.2e-5 m/s (~15 cm/hr)
    kw = float(bec.gas_transfer_velocity(jnp.asarray(7.0),
                                         jnp.asarray(660.0)))
    assert abs(kw - 8.6e-7 * 49.0) < 1e-9
    # quadratic wind dependence
    kw14 = float(bec.gas_transfer_velocity(jnp.asarray(14.0),
                                           jnp.asarray(660.0)))
    assert abs(kw14 / kw - 4.0) < 1e-6


def test_wind_speed_from_stress_roundtrip():
    """WS() inverts the ustar^2(u10) cubic: feeding the stress implied by
    a known u10 recovers it (reference: bec2_driver.F:3228-3322)."""
    rho0, rho_air = 1025.0, 1.2
    c1, c2, c3 = 0.0027, 0.000142, 0.0000764
    for u10 in (3.0, 7.0, 15.0):
        ust2 = u10 * (c1 + u10 * (c2 + u10 * c3))       # m^2/s^2
        tau_kin = ust2 * rho_air / rho0                 # kinematic stress
        ws = float(bec.wind_speed_from_stress(
            jnp.asarray(tau_kin), jnp.asarray(0.0), rho0))
        assert abs(ws - u10) / u10 < 1e-3, (u10, ws)


def test_bgc_diag_writer(tmp_path):
    """The bgc_io-style diagnostics writer: >= 20 registered rate
    diagnostics land in *_bgc_dia.nc with finite values (reference:
    src/bgc_io.F wrt_bgc_diag + bec2_vars.F diag registration)."""
    from roms_tpu.cases import filament
    from roms_tpu.driver import run
    from roms_tpu.io.bgc_io import BgcDiagWriter
    from roms_tpu.io.netcdf import open_dataset

    nbgc = 29
    cfg = filament.config(ntimes=2).replace(
        nx=16, ny=16, nz=8, nt=2 + nbgc, salinity=True, nonlin_eos=True,
        bgc_model="bec2", n_bgc=nbgc)
    grid, st, frc = filament.setup(cfg)
    model = get_model("bec2")
    bgc0 = model.init_tracers(cfg, st.z_r)
    t0 = jnp.concatenate([st.t[:1], jnp.full_like(st.t[:1], 35.0), bgc0])
    st = st.replace(t=t0, t_prev=t0)

    path = str(tmp_path / "roms_bgc_dia.nc")
    dw = BgcDiagWriter(path, grid, cfg)
    st2, _ = run(grid, st, frc, cfg, nsteps=2,
                 step_hook=lambda s, i: dw.write(s, frc))
    dw.close()

    ds = open_dataset(path)
    names = [n for n in ds.variables if n != "ocean_time"]
    assert len(names) >= 20, f"only {len(names)} diagnostics registered"
    expect = {"PAR", "photoC_tot", "POC_flux", "FG_CO2", "pCO2_oc",
              "pH_surf", "NITRIF_NH4_NO2", "DENITRIF", "CaCO3_prod"}
    assert expect <= set(names), expect - set(names)
    for n in ("photoC_tot", "POC_flux", "FG_CO2", "pCO2_oc"):
        a = np.asarray(ds[n][...])
        assert np.all(np.isfinite(a)), n
    assert np.asarray(ds["ocean_time"][...]).shape == (2,)


def test_particulate_flux_conservation():
    """The ballast-model column solve is exactly conservative: column
    integral of remin equals that of production, flux monotonicity at
    the interfaces (reference: P_* implicit particulates,
    bec2_vars.F:100-140)."""
    from roms_tpu.bgc.bec import PART_CACO3, PART_POC, particulate_flux

    rng = np.random.default_rng(1)
    nz = 12
    prod = jnp.asarray(np.abs(rng.standard_normal((nz, 4, 4))) * 1e-6)
    hz = jnp.asarray(3.0 + np.abs(rng.standard_normal((nz, 4, 4))))
    for klass in (PART_POC, PART_CACO3):
        remin, flux, f_bot = particulate_flux(prod, hz, klass)
        col_prod = np.asarray((prod * hz).sum(axis=0))
        col_remin = np.asarray((remin * hz).sum(axis=0))
        np.testing.assert_allclose(col_remin, col_prod, rtol=1e-12)
        assert flux.shape[0] == nz + 1
        assert np.all(np.asarray(flux) >= -1e-18)
        np.testing.assert_allclose(np.asarray(flux[0]), np.asarray(f_bot),
                                   rtol=1e-12)
