"""Tracer + momentum budget diagnostics tests
(reference: src/diagnostics.F; momentum term indices diagnostics.F:56-63).

Beyond closure (rate = sum of terms), the implicit vmix terms are checked
against INDEPENDENT properties of the solve:

  * tracer: per-cell reconstruction of the implicit diffusion+advection
    flux divergence from the solved field with numpy arithmetic, and the
    exact column telescoping sum_z(vmix) = 0 (no-flux solve boundaries);
  * momentum: exact column telescoping sum_z(vmix) = dt*sustr - dt*rd*u_bot
    (the surface stress / bottom drag enter the solve directly).
"""

import jax.numpy as jnp
import numpy as np

from roms_tpu.cases import obc_basin
from roms_tpu.driver import run


def test_budget_closure_and_vmix_reconstruction():
    cfg = obc_basin.config("closed", ntimes=1).replace(
        nx=16, ny=16, nz=6, dt=60.0, ndtfast=20, tracer_diagnostics=True,
        akt_bak=0.0)
    grid, st, forcing = obc_basin.setup(cfg)
    # stratified tracer + constant diffusivity so the implicit solve works
    t0 = 1.0 + 0.1 * jnp.arange(cfg.nz)[None, :, None, None] * jnp.ones_like(st.t)
    akt0 = 1e-3
    st = st.replace(t=t0, t_prev=t0,
                    akt=jnp.full_like(st.akt, akt0))
    st_end, _ = run(grid, st, forcing, cfg)

    b = st_end.t_budget
    assert set(b.keys()) == {"hadv", "vadv", "forc", "vmix", "rate"}
    rate = np.asarray(b["rate"])
    total = (np.asarray(b["hadv"]) + np.asarray(b["vadv"])
             + np.asarray(b["forc"]) + np.asarray(b["vmix"]))
    np.testing.assert_allclose(total, rate, atol=1e-12)
    np.testing.assert_allclose(np.asarray(b["forc"]), 0.0, atol=1e-10)

    # exact column telescoping: the solve's internal fluxes cancel and the
    # boundaries are no-flux, so sum_z vmix = 0 identically
    col = np.asarray(b["vmix"]).sum(axis=1)
    np.testing.assert_allclose(col, 0.0, atol=1e-11)

    # independent per-cell reconstruction of the implicit operator from
    # the solved tracer (interior points away from BC-touched edges;
    # fcv = 2*dt*akt/(hz[k+1]+hz[k]), wi = stored implicit flux)
    sl = (slice(3, -3), slice(3, -3))
    t_new = np.asarray(st_end.t)[0][(slice(None),) + sl]
    hz = np.asarray(st_end.hz)[(slice(None),) + sl]
    wi = np.asarray(st_end.wi)[(slice(None),) + sl]
    pmn = np.asarray(grid.pm * grid.pn)[sl]
    nz = cfg.nz
    fcv = 2.0 * cfg.dt * akt0 / (hz[1:] + hz[:-1])       # ifaces 1..nz-1
    wcv = cfg.dt * pmn[None] * wi[1:nz]
    wcp, wcm = np.maximum(wcv, 0.0), np.minimum(wcv, 0.0)
    flux = fcv * (t_new[1:] - t_new[:-1]) - wcp * t_new[:-1] - wcm * t_new[1:]
    vmix_rec = np.zeros_like(t_new)
    vmix_rec[:-1] += flux
    vmix_rec[1:] -= flux
    got = np.asarray(st_end.t_budget["vmix"])[0][(slice(None),) + sl]
    scale = max(np.abs(got).max(), 1e-30)
    np.testing.assert_allclose(got, vmix_rec, atol=1e-10 * scale, rtol=0)


def test_momentum_budget_closure_and_stress_telescoping():
    cfg = obc_basin.config("closed", ntimes=1).replace(
        nx=16, ny=16, nz=6, dt=60.0, ndtfast=20, uv_diagnostics=True,
        rdrg=0.0)
    grid, st, forcing = obc_basin.setup(cfg)
    akv0 = 1e-3
    tau = 1e-4
    st = st.replace(akv=jnp.full_like(st.akv, akv0))
    forcing = forcing.replace(sustr=jnp.full_like(forcing.sustr, tau))
    st_end, _ = run(grid, st, forcing, cfg)

    b = st_end.uv_budget
    assert set(b.keys()) == {"u", "v"}
    for comp in ("u", "v"):
        terms = b[comp]
        assert set(terms.keys()) == {"pgr", "cori", "adv", "hmix", "vmix",
                                     "coup", "rate"}
        total = sum(np.asarray(terms[k]) for k in
                    ("pgr", "cori", "adv", "hmix", "vmix", "coup"))
        np.testing.assert_allclose(total, np.asarray(terms["rate"]),
                                   atol=1e-12)

    # the u implicit solve receives dt*sustr in its top cell and rd=0 at
    # the bottom, so the column sum of vmix telescopes to exactly dt*sustr
    # (interior columns away from walls)
    colsum = np.asarray(b["u"]["vmix"]).sum(axis=0)[4:-4, 4:-4]
    np.testing.assert_allclose(colsum, cfg.dt * tau, rtol=1e-10)
    # pressure gradient from the zeta bump is a leading term
    assert np.abs(np.asarray(b["u"]["pgr"])).max() > 0.0
