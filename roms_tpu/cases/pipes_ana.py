"""Pipes_ana test case (reference: tests/Pipes_ana/).

Closed shelf basin (100x100x10, 30 km) with a submerged 2x2-cell pipe
source at mid-domain discharging into the bottom two levels; nonlinear
split EOS, T+S, full KPP (reference: tests/Pipes_ana/ana_grid.h,
ana_pipe_frc.h, benchmark.in).
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

SIZE = 30.0e3
F0 = 1.0e-4
DEPTH = 10.0
MAX_DEPTH = 100.0
PIPE_VOL = 5.0e2
PIPE_TRC = (24.0, 1.0)


def config(ntimes: int = 20) -> ModelConfig:
    return ModelConfig(
        nx=100, ny=100, nz=10, nt=2,
        dt=60.0, ndtfast=30, ntimes=ntimes,
        theta_s=6.0, theta_b=6.0, hc=25.0,
        rho0=1027.5,
        rdrg=0.0, rdrg2=1.0e-3, zob=1.0e-2, gamma2=1.0,
        visc2=0.0, tnu2=0.0, akv_bak=0.0, akt_bak=0.0,
        nonlin_eos=True, salinity=True, lmd_kpp=True,
        pipe_source=True,
        ew_periodic=False, ns_periodic=False, masking=True)


def setup(cfg: ModelConfig | None = None, dtype=jnp.float64):
    if cfg is None:
        cfg = config()
    h = cfg.halo
    npdt = np.float64
    jy, ix = cfg.ny + 2 * h, cfg.nx + 2 * h

    # ---- analytic grid (reference: tests/Pipes_ana/ana_grid.h) -----------
    dx = SIZE / cfg.nx
    dy = SIZE / cfg.ny
    i_f = np.arange(-1, cfg.nx + 3, dtype=npdt)
    j_f = np.arange(-1, cfg.ny + 3, dtype=npdt)
    xr = np.broadcast_to((dx * (i_f - 0.5))[None, :], (jy, ix)).copy()
    yr = np.broadcast_to((dy * (j_f - 0.5))[:, None], (jy, ix)).copy()
    pm = np.full((jy, ix), 1.0 / dx, npdt)
    pn = np.full((jy, ix), 1.0 / dy, npdt)
    f = np.full((jy, ix), F0, npdt)

    shelf = SIZE / 5.0
    slope = (MAX_DEPTH - DEPTH) / (SIZE * 4.0 / 5.0)
    hb = np.where(yr < shelf, DEPTH, DEPTH + (yr - shelf) * slope)

    land = SIZE * 0.1
    coast = SIZE * 0.02
    riv_west = SIZE * 0.4
    riv_east = SIZE * 0.6
    rmask = np.ones((jy, ix), npdt)
    in_channel = (xr > riv_west) & (xr < riv_east)
    rmask[(yr < land) & ~in_channel] = 0.0
    rmask[yr < coast] = 0.0

    grid = build_grid(cfg, hb, pm, pn, f, rmask, xr=xr, yr=yr, dtype=dtype)

    # ---- pipe placement (reference: ana_grid.h:96-113) --------------------
    psz = SIZE * 0.02
    px = SIZE * 0.5
    py = SIZE * 0.5
    pipe_cells = np.rint(psz / dx) ** 2
    in_pipe = ((xr > px - 0.5 * psz) & (xr < px + 0.5 * psz)
               & (yr > py - 0.5 * psz) & (yr < py + 0.5 * psz))
    pipe_fraction = np.where(in_pipe, 1.0 / pipe_cells, 0.0)
    pipe_idx = np.where(in_pipe, 1, 0).astype(np.int32)
    # profile: half into each of the two bottom levels
    # (reference: ana_pipe_frc.h)
    pipe_prf = np.zeros((2, cfg.nz))
    pipe_prf[1, 0] = 0.5
    pipe_prf[1, 1] = 0.5
    pipe_flx = pipe_fraction * PIPE_VOL

    # ---- vertical grid at rest -------------------------------------------
    zeros2 = jnp.zeros((jy, ix), dtype)
    z_w, z_r, hz = vcoord.set_depth(zeros2, grid.h, grid.hinv,
                                    grid.cs_w, grid.cs_r, cfg.hc, cfg.nz)

    # ---- initial state (same form as Rivers_ana: ana_init.h) -------------
    st = zeros_state(cfg, dtype)
    temp = 4.0 + 10.0 * jnp.exp(z_r / 50.0)
    salt = jnp.full_like(temp, 36.0)
    t0 = jnp.stack([temp, salt], axis=0)
    halo_fill = make_halo_fill(cfg)
    st = st.replace(t=t0, t_prev=t0, z_w=z_w, z_r=z_r, hz=hz,
                    swrf=kpp.swr_frac(hz, cfg))

    forcing = zero_forcing(cfg, dtype)
    forcing = forcing.replace(
        pipe_flx=jnp.asarray(pipe_flx, dtype),
        pipe_idx=jnp.asarray(pipe_idx),
        pipe_prf=jnp.asarray(pipe_prf, dtype),
        pipe_trc=jnp.asarray(np.array([[0.0, 0.0], list(PIPE_TRC)]), dtype))

    flx_u, flx_v = kinematics.set_huv(st.u, st.v, hz, grid)
    flx_u, flx_v = halo_fill(flx_u), halo_fill(flx_v)
    om = kinematics.omega(flx_u, flx_v, z_w, hz, zeros2, grid,
                          0.6 * cfg.dt, cfg, forcing)
    eos0 = rho_eos(st.t, z_r, z_w, hz, grid.rmask, cfg)
    st = st.replace(flx_u=flx_u, flx_v=flx_v, we=halo_fill(om.we),
                    wi=halo_fill(om.wi), rho=eos0.rho)
    return grid, st, forcing
