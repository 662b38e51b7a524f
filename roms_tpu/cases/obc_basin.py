"""Idealized open-boundary basin cases (no reference-analog input files
needed): built to exercise the OBC kernels the way the reference's realistic
cases do (reference: tests/Flux_frc/cppdefs.opt OBC_* switches with
OBC_M2FLATHER / OBC_M3ORLANSKI / OBC_TORLANSKI + *_FRC_BRY).

Two configurations:

  * `radiating`: flat-bottom basin, Gaussian free-surface bump, all four
    edges open with zero external data — the barotropic wave must radiate
    out through the Flather boundaries instead of reflecting.
  * `inflow`: west/east open with specified external data driving a uniform
    zonal inflow carrying a warm tracer anomaly into the domain.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from roms_tpu.config import ModelConfig
from roms_tpu.grid import build_grid
from roms_tpu.ops import kinematics
from roms_tpu.ops.eos import rho_eos
from roms_tpu.state import zeros_state, zero_forcing, zero_boundary

H0 = 100.0      # flat bottom depth [m]
F0 = 1.0e-4     # Coriolis
DX = 1000.0     # grid spacing [m]
ZAMP = 0.1      # initial bump amplitude [m]


def config(mode: str = "radiating", ntimes: int = 60) -> ModelConfig:
    common = dict(
        nx=64, ny=64, nz=10, nt=1,
        dt=60.0, ndtfast=30, ntimes=ntimes,
        theta_s=3.0, theta_b=0.0, hc=50.0,
        nonlin_eos=False, salinity=False, tcoef=0.2, t0=1.0,
        ew_periodic=False, ns_periodic=False, masking=True,
        uv_adv=True, uv_cor=True,
        rdrg=0.0, visc2=0.0, tnu2=0.0,
        frc_bry=True, ubind=0.1)
    if mode == "radiating":
        return ModelConfig(obc_west=True, obc_east=True,
                           obc_south=True, obc_north=True,
                           obc_m2="flather", obc_m3="orlanski",
                           obc_t="orlanski", **common)
    if mode == "inflow":
        # specified tracer data at the inflow boundary (OBC_TSPECIFIED)
        return ModelConfig(obc_west=True, obc_east=True,
                           obc_m2="flather", obc_m3="orlanski",
                           obc_t="specified", **common)
    if mode == "closed":
        return ModelConfig(**common)
    raise ValueError(mode)


def setup(cfg: ModelConfig, dtype=jnp.float64, inflow_u: float = 0.0,
          t_inflow: float | None = None, land_blob: bool = False):
    """Build (grid, state, forcing).  For the inflow case pass
    `inflow_u` > 0 and `t_inflow` (boundary tracer value).  With
    `land_blob` a circular island is masked out in the NE quadrant so the
    masked-update paths are genuinely exercised (not an all-ones mask)."""
    h = cfg.halo
    npdt = np.float64
    jy, ix = cfg.ny + 2 * h, cfg.nx + 2 * h

    i_f = np.arange(-1, cfg.nx + 3, dtype=npdt)
    j_f = np.arange(-1, cfg.ny + 3, dtype=npdt)
    xr1 = DX * (i_f - 0.5)
    yr1 = DX * (j_f - 0.5)
    xr = np.broadcast_to(xr1[None, :], (jy, ix)).copy()
    yr = np.broadcast_to(yr1[:, None], (jy, ix)).copy()
    pm = np.full((jy, ix), 1.0 / DX, npdt)
    pn = np.full((jy, ix), 1.0 / DX, npdt)
    f = np.full((jy, ix), F0, npdt)
    hb = np.full((jy, ix), H0, npdt)
    rmask = np.ones((jy, ix), npdt)
    if land_blob:
        r2 = ((xr - 0.7 * cfg.nx * DX) ** 2
              + (yr - 0.7 * cfg.ny * DX) ** 2)
        rmask[r2 < (0.12 * cfg.nx * DX) ** 2] = 0.0
    grid = build_grid(cfg, hb, pm, pn, f, rmask, xr=xr, yr=yr, dtype=dtype)

    st = zeros_state(cfg, dtype)

    if inflow_u == 0.0:
        # Gaussian free-surface bump in the basin center
        xc = 0.5 * cfg.nx * DX
        yc = 0.5 * cfg.ny * DX
        r2 = (xr - xc) ** 2 + (yr - yc) ** 2
        zeta = ZAMP * np.exp(-r2 / (8.0 * DX) ** 2)
        zeta_j = jnp.asarray(zeta, dtype)
        u_j = st.u
        ubar_j = st.ubar
    else:
        zeta_j = st.zeta
        u_j = jnp.full_like(st.u, inflow_u)
        ubar_j = jnp.full_like(st.ubar, inflow_u)

    from roms_tpu import vcoord
    z_w, z_r, hz = vcoord.set_depth(zeta_j, grid.h, grid.hinv,
                                    grid.cs_w, grid.cs_r, cfg.hc, cfg.nz)
    t_j = jnp.ones((cfg.nt, cfg.nz, jy, ix), dtype)  # uniform T = 1

    from roms_tpu.parallel.halo import shift
    du_avg1 = 0.5 * (grid.h + shift(grid.h, 0, -1)
                     + zeta_j + shift(zeta_j, 0, -1)) * grid.dn_u * ubar_j
    st = st.replace(zeta=zeta_j, u=u_j, u_prev=u_j, ubar=ubar_j,
                    t=t_j, t_prev=t_j, z_w=z_w, z_r=z_r, hz=hz,
                    du_avg1=du_avg1)

    flx_u, flx_v = kinematics.set_huv(st.u, st.v, hz, grid)
    om = kinematics.omega(flx_u, flx_v, z_w, hz, st.zeta * 0.0, grid,
                          0.6 * cfg.dt)
    eos0 = rho_eos(st.t, z_r, z_w, hz, grid.rmask, cfg)
    st = st.replace(flx_u=flx_u, flx_v=flx_v, we=om.we, wi=om.wi,
                    rho=eos0.rho)

    bry = zero_boundary(cfg, dtype)
    if inflow_u != 0.0:
        tb = t_inflow if t_inflow is not None else 1.0
        bry = bry.replace(
            ubar_west=jnp.full((jy,), inflow_u, dtype),
            u_west=jnp.full((cfg.nz, jy), inflow_u, dtype),
            t_west=jnp.full((cfg.nt, cfg.nz, jy), tb, dtype),
            ubar_east=jnp.full((jy,), inflow_u, dtype),
            u_east=jnp.full((cfg.nz, jy), inflow_u, dtype),
            t_east=jnp.ones((cfg.nt, cfg.nz, jy), dtype))
    forcing = zero_forcing(cfg, dtype).replace(bry=bry)
    return grid, st, forcing
