"""Filament idealized test case (reference: tests/Filament/).

Doubly-periodic 64x64x32 submesoscale cold-filament setup with analytic
grid and geostrophically balanced initial state
(reference: tests/Filament/ana_grid.h, ana_init.h, benchmark.in), exercising
only the split-explicit dynamical core.  Its 20-step diagnostics series is
the frozen regression oracle
(reference: tests/Filament/benchmark.result_github_gnu).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from roms_tpu.config import ModelConfig
from roms_tpu.grid import build_grid
from roms_tpu.ops import kinematics
from roms_tpu.ops.eos import rho_eos
from roms_tpu.parallel.halo import make_halo_fill
from roms_tpu.state import OceanState, zeros_state, zero_forcing
from roms_tpu import vcoord

# physical parameters (reference: tests/Filament/ana_grid.h, ana_init.h,
# param.opt HD, benchmark.in)
SIZE_X = 12.8e3
SIZE_Y = 3.2e3
F0 = 2 * 7.81e-5
HD = 1000.0
B0 = 5.0e-2
B_CFF = 0.025
LAMBDA_INV = 8.0
NB = 1.0e-7
N0 = 3.0e-5
H0 = 60.0
DH0 = 15.0
L_FIL = 2000.0


def config(ntimes: int = 20) -> ModelConfig:
    return ModelConfig(
        nx=64, ny=64, nz=32, nt=1,
        dt=5.0, ndtfast=60, ntimes=ntimes,
        theta_s=6.0, theta_b=2.0, hc=25.0,
        rho0=1000.0, tcoef=0.2, t0=1.0,
        rdrg=0.0, rdrg2=1.0e-3, zob=1.0e-2,
        visc2=0.0, tnu2=0.0, akv_bak=0.0, akt_bak=0.0,
        nonlin_eos=False, salinity=False,
        ew_periodic=True, ns_periodic=True, masking=True)


def setup(cfg: ModelConfig | None = None, dtype=jnp.float64):
    """Build (grid, state, forcing) for the Filament case.

    Reproduces the reference init sequence (reference: main.F:86-321):
    analytic grid → set_depth at rest (zeta=0) → ana_init (which uses the
    rest-state z_r/Hz) → set_depth with the analytic zeta → set_HUV →
    omega → rho_eos.
    """
    if cfg is None:
        cfg = config()
    h = cfg.halo
    npdt = np.float64
    jy, ix = cfg.ny + 2 * h, cfg.nx + 2 * h

    # ---- analytic grid (reference: tests/Filament/ana_grid.h) -----------
    dx = SIZE_X / cfg.nx
    dy = SIZE_Y / cfg.ny
    # Fortran index i = -1..nx+2 ↔ padded index ip = i+1
    i_f = np.arange(-1, cfg.nx + 3, dtype=npdt)
    j_f = np.arange(-1, cfg.ny + 3, dtype=npdt)
    xr1 = dx * (i_f - 0.5) - SIZE_X / 2.0
    yr1 = dy * (j_f - 0.5)
    xr = np.broadcast_to(xr1[None, :], (jy, ix)).copy()
    yr = np.broadcast_to(yr1[:, None], (jy, ix)).copy()
    pm = np.full((jy, ix), 1.0 / dx, npdt)
    pn = np.full((jy, ix), 1.0 / dy, npdt)
    f = np.full((jy, ix), F0, npdt)
    hb = np.full((jy, ix), HD, npdt)
    rmask = np.ones((jy, ix), npdt)

    grid = build_grid(cfg, hb, pm, pn, f, rmask, xr=xr, yr=yr, dtype=dtype)

    # ---- rest-state vertical grid for ana_init (zeta = 0), pure numpy
    # float64 regardless of the model dtype -----------------------------------
    cs_w, cs_r = vcoord.stretching_curves(cfg.nz, cfg.theta_s, cfg.theta_b)
    ds = 1.0 / cfg.nz
    hinv0 = 1.0 / (hb + cfg.hc)
    k_w = np.arange(0, cfg.nz + 1, dtype=npdt)[:, None, None]
    k_r = np.arange(1, cfg.nz + 1, dtype=npdt)[:, None, None]
    z_w0 = hb[None] * (cfg.hc * ds * (k_w - cfg.nz)
                       + cs_w[:, None, None] * hb[None]) * hinv0[None]
    z_w0[0] = -hb
    z_r0 = hb[None] * (cfg.hc * ds * (k_r - cfg.nz - 0.5)
                       + cs_r[:, None, None] * hb[None]) * hinv0[None]
    hz0 = z_w0[1:] - z_w0[:-1]

    # ---- ana_init (reference: tests/Filament/ana_init.h) ----------------
    g = cfg.g
    alpha = cfg.tcoef / cfg.rho0
    h_sbl = H0 + DH0 * np.exp(-((xr / L_FIL) ** 2))  # (jy, ix)

    def logcosh(x):
        # overflow-safe log(cosh(x)) = |x| + log1p(exp(-2|x|)) - log(2)
        ax = np.abs(x)
        return ax + np.log1p(np.exp(-2.0 * ax)) - np.log(2.0)

    def buoyancy(z, hs):
        return (B0 + NB * (z + HD)
                + 0.5 * N0 * ((1 + B_CFF) * z - (1 - B_CFF)
                              * (hs + LAMBDA_INV
                                 * logcosh((1.0 / LAMBDA_INV) * (z + hs)))))

    t = buoyancy(z_r0, h_sbl[None]) / (g * alpha)  # (nz, jy, ix)

    # bf_int at any interior column (uniform h, zeta=0 → columns identical;
    # reference evaluates at local point (1,1): ana_init.h bf_int loop)
    c0 = (h, h)
    bf_int = float(np.sum(hz0[(slice(None),) + c0]
                          * buoyancy(z_r0[(slice(None),) + c0], H0)) / g)

    zeta = np.sum(t * alpha * hz0, axis=0) - bf_int

    # geostrophic v: surface from dzeta/dx, thermal wind downward
    v = np.zeros_like(t)
    dzdx = 0.5 * (1.0 / dx) * (np.roll(zeta, -1, axis=1)
                               - np.roll(zeta, 1, axis=1))
    v[cfg.nz - 1] = g * dzdx / F0
    for k in range(cfg.nz - 2, -1, -1):
        dbdx = 0.25 * (1.0 / dx) * g * alpha * (
            np.roll(t[k], -1, axis=1) - np.roll(t[k], 1, axis=1)
            + np.roll(t[k + 1], -1, axis=1) - np.roll(t[k + 1], 1, axis=1))
        v[k] = v[k + 1] - dbdx * (z_r0[k + 1] - z_r0[k]) / F0
    # NOTE: np.roll wraps at array ends, but those values only land in the
    # outermost ghost ring, which is refreshed below; the reference computes
    # v only on 0..nx+1 and then exchanges.

    # vbar: vertical sum EXCLUDING the top level, as the reference does
    # (reference: ana_init.h: do k=nz-1,1,0-1 accumulation loop)
    vbar = np.sum(v[:cfg.nz - 1] * hz0[:cfg.nz - 1], axis=0) / HD

    # ---- assemble state --------------------------------------------------
    st = zeros_state(cfg, dtype)
    halo_fill = make_halo_fill(cfg)
    zeta_j = halo_fill(jnp.asarray(zeta, dtype))
    t_j = halo_fill(jnp.asarray(t, dtype)[None])
    v_j = halo_fill(jnp.asarray(v, dtype))
    vbar_j = halo_fill(jnp.asarray(vbar, dtype))

    # vertical grid from the analytic free surface (reference: main.F:268)
    z_w, z_r, hz = vcoord.set_depth(zeta_j, grid.h, grid.hinv,
                                    grid.cs_w, grid.cs_r, cfg.hc, cfg.nz)
    z_w, z_r, hz = halo_fill(z_w), halo_fill(z_r), halo_fill(hz)

    # initial fast-averaged fluxes (reference: set_depth.F:42-63, iic==0)
    du_avg1 = jnp.zeros_like(zeta_j)  # ubar = 0
    from roms_tpu.parallel.halo import shift
    dv_avg1 = 0.5 * (grid.h + shift(grid.h, -1, 0)
                     + zeta_j + shift(zeta_j, -1, 0)) * grid.dm_v * vbar_j
    dv_avg1 = halo_fill(dv_avg1)

    st = st.replace(zeta=zeta_j, vbar=vbar_j, v=v_j, v_prev=v_j,
                    t=t_j, t_prev=t_j, z_w=z_w, z_r=z_r, hz=hz,
                    du_avg1=du_avg1, dv_avg1=dv_avg1)

    # initial kinematics for the step-0 diagnostics (reference: main.F:281-288)
    flx_u, flx_v = kinematics.set_huv(st.u, st.v, hz, grid)
    flx_u, flx_v = halo_fill(flx_u), halo_fill(flx_v)
    om = kinematics.omega(flx_u, flx_v, z_w, hz, st.zeta * 0.0, grid,
                          0.6 * cfg.dt)
    eos0 = rho_eos(st.t, z_r, z_w, hz, grid.rmask, cfg)
    st = st.replace(flx_u=flx_u, flx_v=flx_v,
                    we=halo_fill(om.we), wi=halo_fill(om.wi), rho=eos0.rho)

    forcing = zero_forcing(cfg, dtype)
    return grid, st, forcing
