"""Production-physics benchmark configuration (no file inputs).

The light Filament-type bench exercises only the split-explicit core; a
production step of the reference also pays for the nonlinear split EOS,
KPP, salinity, a ~30-tracer passive load, land masking and open
boundaries (reference: the default production config is 920x480x60 with
full physics, src/param.opt:18-21; the USWC test cases run MARBL's 32
tracers, tests/CDR_parameterized/param.opt).  This module builds an
analytic configuration with exactly that cost profile so `bench.py` can
report an honest production-physics throughput:

  * shelf-to-deep tanh bathymetry with a curving coastline mask
    (~15% land), CURVGRID metrics;
  * stratified T/S with a baroclinic coastal jet in geostrophic balance;
  * 32 passive tracers (smooth initial fields) advected/diffused/mixed
    by the full batched tracer engine;
  * KPP surface boundary layer driven by analytic wind stress + solar;
  * 4-side open boundaries (Flather / Orlanski / Orlanski) with external
    data = the initial edge state.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from roms_tpu.config import ModelConfig
from roms_tpu.grid import build_grid
from roms_tpu.ops import kinematics
from roms_tpu.ops.eos import rho_eos
from roms_tpu.state import zero_boundary, zero_forcing, zeros_state

F0 = 8.0e-5
BETA = 2.0e-11
DX = 2500.0        # [m]
HMIN, HMAX = 30.0, 4000.0


def config(nx: int = 512, ny: int = 256, nz: int = 60,
           nt: int = 34) -> ModelConfig:
    return ModelConfig(
        nx=nx, ny=ny, nz=nz, nt=nt,
        dt=240.0, ndtfast=40, ntimes=10,
        theta_s=6.0, theta_b=6.0, hc=250.0,
        nonlin_eos=True, salinity=True, lmd_kpp=True,
        curvgrid=True, masking=True,
        ew_periodic=False, ns_periodic=False,
        obc_west=True, obc_east=True, obc_south=True, obc_north=True,
        obc_m2="flather", obc_m3="orlanski", obc_t="orlanski",
        frc_bry=True, ubind=0.1,
        uv_adv=True, uv_cor=True,
        visc2=5.0, tnu2=1.0, rdrg=3.0e-4)


def setup(cfg: ModelConfig, dtype=jnp.float32):
    h = cfg.halo
    jy, ix = cfg.ny + 2 * h, cfg.nx + 2 * h
    npdt = np.float64

    iy = np.arange(-1, cfg.ny + 3, dtype=npdt)[:, None]
    jx = np.arange(-1, cfg.nx + 3, dtype=npdt)[None, :]
    x = DX * jx
    y = DX * iy
    lx = DX * cfg.nx

    # curving coastline on the east; tanh shelf-to-slope bathymetry
    coast = lx - 0.12 * lx * (1.0 + 0.5 * np.sin(4.0 * np.pi * y / (DX * cfg.ny)))
    d = coast - x                         # distance to coast [m]
    hb = HMIN + 0.5 * (HMAX - HMIN) * (1.0 + np.tanh((d - 40.0e3) / 25.0e3))
    rmask = (d > 0.0).astype(npdt)
    hb = np.maximum(hb, HMIN)

    # mild curvilinear metric variation (CURVGRID cost)
    pm = (1.0 / DX) * (1.0 + 0.1 * np.sin(2.0 * np.pi * y / (DX * cfg.ny)))
    pn = (1.0 / DX) * (1.0 + 0.1 * np.cos(2.0 * np.pi * x / lx))
    f = F0 + BETA * (y - 0.5 * DX * cfg.ny)

    grid = build_grid(cfg, hb, np.broadcast_to(pm, (jy, ix)).copy(),
                      np.broadcast_to(pn, (jy, ix)).copy(),
                      np.broadcast_to(f, (jy, ix)).copy(),
                      rmask, xr=np.broadcast_to(x, (jy, ix)).copy(),
                      yr=np.broadcast_to(y, (jy, ix)).copy(), dtype=dtype)

    st = zeros_state(cfg, dtype)

    # geostrophic surface depression along the shelf break
    zeta = -0.12 * np.exp(-((d - 60.0e3) / 40.0e3) ** 2) * rmask
    zeta_j = jnp.asarray(zeta, dtype)

    from roms_tpu import vcoord
    z_w, z_r, hz = vcoord.set_depth(zeta_j, grid.h, grid.hinv,
                                    grid.cs_w, grid.cs_r, cfg.hc, cfg.nz)
    z_rn = np.asarray(z_r, npdt)

    # stratified T/S + 32 smooth passive tracers
    temp = 4.0 + 14.0 * np.exp(z_rn / 250.0) + 0.5 * np.exp(z_rn / 40.0)
    salt = 34.8 - 0.6 * np.exp(z_rn / 120.0)
    tr = [temp, salt]
    for k in range(cfg.nt - 2):
        tr.append(1.0 + 0.5 * np.sin(2.0 * np.pi * (k + 1) * x / lx)
                  * np.exp(z_rn / (60.0 + 10.0 * k)))
    t_j = jnp.asarray(np.stack(tr), dtype)

    from roms_tpu.ops import kpp
    st = st.replace(zeta=zeta_j, t=t_j, t_prev=t_j, z_w=z_w, z_r=z_r, hz=hz,
                    swrf=kpp.swr_frac(hz, cfg))
    flx_u, flx_v = kinematics.set_huv(st.u, st.v, hz, grid)
    om = kinematics.omega(flx_u, flx_v, z_w, hz, st.zeta * 0.0, grid,
                          0.6 * cfg.dt)
    eos0 = rho_eos(st.t, z_r, z_w, hz, grid.rmask, cfg)
    st = st.replace(flx_u=flx_u, flx_v=flx_v, we=om.we, wi=om.wi,
                    rho=eos0.rho)

    # boundary data = initial edge state (consistent OBC)
    bry = zero_boundary(cfg, dtype).replace(
        zeta_west=st.zeta[:, h], zeta_east=st.zeta[:, -h - 1],
        zeta_south=st.zeta[h, :], zeta_north=st.zeta[-h - 1, :],
        t_west=st.t[:, :, :, h], t_east=st.t[:, :, :, -h - 1],
        t_south=st.t[:, :, h, :], t_north=st.t[:, :, -h - 1, :])

    # analytic wind stress + solar (kinematic units) to drive KPP
    tau = 0.07 / cfg.rho0
    sustr = jnp.asarray(np.broadcast_to(
        tau * np.sin(np.pi * y / (DX * cfg.ny)) ** 2, (jy, ix)).copy(), dtype)
    srflx = jnp.full((jy, ix), 180.0 / (cfg.rho0 * 3985.0), dtype)
    stflx = jnp.zeros((cfg.nt, jy, ix), dtype).at[0].set(
        -40.0 / (cfg.rho0 * 3985.0))
    forcing = zero_forcing(cfg, dtype).replace(
        bry=bry, sustr=sustr, srflx=srflx, stflx=stflx)
    return grid, st, forcing
