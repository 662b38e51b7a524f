"""Rivers_ana test case (reference: tests/Rivers_ana/).

Closed shelf basin (100x100x10) with a land strip in the south, a river
channel cut through the land, and one analytic river source; nonlinear
split EOS, T+S, full KPP (reference: tests/Rivers_ana/ana_grid.h,
ana_init.h, ana_frc_river.h, benchmark.in, cppdefs.opt).  Its 20-step
diagnostics series is a frozen regression oracle
(reference: tests/Rivers_ana/benchmark.result_github_gnu).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from roms_tpu.config import ModelConfig
from roms_tpu.grid import build_grid
from roms_tpu.ops import kinematics, kpp
from roms_tpu.ops.eos import rho_eos
from roms_tpu.parallel.halo import make_halo_fill
from roms_tpu.state import zeros_state, zero_forcing
from roms_tpu import vcoord

SIZE_XI = 1.0e4
SIZE_ETA = 1.0e4
DEPTH = 5.0
MAX_DEPTH = 100.0
RIV_VOL = 5.0e2            # m^3/s (reference: ana_frc_river.h)
RIV_TRC = (24.0, 1.0)      # temperature, salinity


def config(ntimes: int = 20) -> ModelConfig:
    return ModelConfig(
        nx=100, ny=100, nz=10, nt=2,
        dt=20.0, ndtfast=30, ntimes=ntimes,
        theta_s=6.0, theta_b=6.0, hc=25.0,
        rho0=1027.5,
        rdrg=0.0, rdrg2=1.0e-3, zob=1.0e-2, gamma2=1.0,
        visc2=0.0, tnu2=0.0, akv_bak=0.0, akt_bak=0.0,
        nonlin_eos=True, salinity=True, lmd_kpp=True,
        river_source=True,
        ew_periodic=False, ns_periodic=False, masking=True)


def build_river_faces(rmask, rfrc, ridx):
    """Distribute each river cell's fraction to its unmasked neighbor faces
    with the ±frac/faces + 10*index encoding
    (reference: river_frc.F:240-280, calc_river_flux)."""
    jy, ix = rmask.shape
    uflx = np.zeros((jy, ix))
    vflx = np.zeros((jy, ix))
    for j in range(1, jy - 1):
        for i in range(1, ix - 1):
            if rfrc[j, i] > 0:
                faces = (rmask[j, i - 1] + rmask[j, i + 1]
                         + rmask[j - 1, i] + rmask[j + 1, i])
                if faces == 0 or rmask[j, i] > 0:
                    raise ValueError(f"river grid position error at {i},{j}")
                if rmask[j, i - 1] > 0:
                    uflx[j, i] = -rfrc[j, i] / faces + 10 * ridx[j, i]
                if rmask[j, i + 1] > 0:
                    uflx[j, i + 1] = rfrc[j, i] / faces + 10 * ridx[j, i]
                if rmask[j - 1, i] > 0:
                    vflx[j, i] = -rfrc[j, i] / faces + 10 * ridx[j, i]
                if rmask[j + 1, i] > 0:
                    vflx[j + 1, i] = rfrc[j, i] / faces + 10 * ridx[j, i]
    return uflx, vflx


def setup(cfg: ModelConfig | None = None, dtype=jnp.float64):
    if cfg is None:
        cfg = config()
    h = cfg.halo
    npdt = np.float64
    jy, ix = cfg.ny + 2 * h, cfg.nx + 2 * h

    # ---- analytic grid (reference: tests/Rivers_ana/ana_grid.h) ----------
    dx = SIZE_XI / cfg.nx
    dy = SIZE_ETA / cfg.ny
    i_f = np.arange(-1, cfg.nx + 3, dtype=npdt)
    j_f = np.arange(-1, cfg.ny + 3, dtype=npdt)
    xr1 = dx * (i_f - 0.5)
    yr1 = dy * (j_f - 0.5)
    xr = np.broadcast_to(xr1[None, :], (jy, ix)).copy()
    yr = np.broadcast_to(yr1[:, None], (jy, ix)).copy()
    pm = np.full((jy, ix), 1.0 / dx, npdt)
    pn = np.full((jy, ix), 1.0 / dy, npdt)
    f = np.zeros((jy, ix), npdt)           # f0 = 0

    shelf = SIZE_ETA / 5.0
    slope = (MAX_DEPTH - DEPTH) / (SIZE_ETA * 4.0 / 5.0)
    hb = np.where(yr < shelf, DEPTH, DEPTH + (yr - shelf) * slope)

    land = SIZE_ETA * 0.1
    coast = SIZE_ETA * 0.02
    riv_west = SIZE_XI * 0.4
    riv_east = SIZE_XI * 0.6
    rmask = np.ones((jy, ix), npdt)
    in_channel = (xr > riv_west) & (xr < riv_east)
    rmask[(yr < land) & ~in_channel] = 0.0
    rmask[yr < coast] = 0.0

    grid = build_grid(cfg, hb, pm, pn, f, rmask, xr=xr, yr=yr, dtype=dtype)

    # ---- river faces (reference: river_frc.F:121-139 analytic branch) ---
    riv_cells = np.rint((riv_east - riv_west) / dx)
    rfrc = np.zeros((jy, ix))
    ridx = np.zeros((jy, ix), np.int64)
    src = (in_channel & (rmask == 0.0)
           & (np.roll(rmask, -1, axis=0) == 1.0))
    # restrict to the Fortran loop range 0..n+1 (first ring)
    src[0, :] = src[-1, :] = False
    src[:, 0] = src[:, -1] = False
    rfrc[src] = 1.0 / riv_cells
    ridx[src] = 1
    uflx, vflx = build_river_faces(rmask, rfrc, ridx)

    # ---- vertical grid at rest (zeta = 0) --------------------------------
    cs_w, cs_r = vcoord.stretching_curves(cfg.nz, cfg.theta_s, cfg.theta_b)
    zeros2 = jnp.zeros((jy, ix), dtype)
    z_w, z_r, hz = vcoord.set_depth(zeros2, grid.h, grid.hinv,
                                    grid.cs_w, grid.cs_r, cfg.hc, cfg.nz)

    # ---- initial state (reference: tests/Rivers_ana/ana_init.h) ----------
    st = zeros_state(cfg, dtype)
    temp = 4.0 + 10.0 * jnp.exp(z_r / 50.0)
    salt = jnp.full_like(temp, 36.0)
    t0 = jnp.stack([temp, salt], axis=0)
    halo_fill = make_halo_fill(cfg)

    st = st.replace(t=t0, t_prev=t0, z_w=z_w, z_r=z_r, hz=hz)

    # swr_frac from the rest-state Hz, once (reference: main.F:216-220)
    swrf = kpp.swr_frac(hz, cfg)
    st = st.replace(swrf=swrf)

    # initial fast-averaged fluxes are zero (ubar=vbar=0,
    # reference: set_depth.F:42-63)
    flx_u, flx_v = kinematics.set_huv(st.u, st.v, hz, grid)
    flx_u, flx_v = halo_fill(flx_u), halo_fill(flx_v)
    om = kinematics.omega(flx_u, flx_v, z_w, hz, zeros2, grid,
                          0.6 * cfg.dt, cfg)
    eos0 = rho_eos(st.t, z_r, z_w, hz, grid.rmask, cfg)
    st = st.replace(flx_u=flx_u, flx_v=flx_v, we=halo_fill(om.we),
                    wi=halo_fill(om.wi), rho=eos0.rho)

    forcing = zero_forcing(cfg, dtype)
    nriv = 2  # index 0 unused; river ids are 1-based
    riv_vol = jnp.zeros((nriv,), dtype).at[1].set(RIV_VOL)
    riv_trc = jnp.zeros((nriv, cfg.nt), dtype)
    riv_trc = riv_trc.at[1, 0].set(RIV_TRC[0]).at[1, 1].set(RIV_TRC[1])
    forcing = forcing.replace(
        riv_uflx=jnp.asarray(uflx, dtype), riv_vflx=jnp.asarray(vflx, dtype),
        riv_vol=riv_vol, riv_trc=riv_trc)
    return grid, st, forcing
