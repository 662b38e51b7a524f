"""Input readers: grid and initial/restart state from whole-grid ROMS
NetCDF files (reference: src/grid.F get_grid, src/get_init.F).

Unlike the reference (which requires `partit`-split per-rank files,
reference: Tools-Roms/partit.F), whole-grid files are read directly and
embedded into the padded compute layout; sharding happens afterwards via
`roms_tpu.parallel.dist.shard_tree`.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax.numpy as jnp

from roms_tpu.config import ModelConfig
from roms_tpu.forcing import pad_field
from roms_tpu.grid import Grid, build_grid
from roms_tpu.io.netcdf import open_dataset
from roms_tpu.state import OceanState, zeros_state
from roms_tpu import vcoord

DEG2RAD = np.pi / 180.0
EARTH_RADIUS = 6371315.0  # [m] (reference: scalars.F Eradius)


def read_grid(path: str, cfg: ModelConfig, dtype=jnp.float64) -> Grid:
    """Load a ROMS grid file (variables h, pm, pn, f, mask_rho/rmask,
    lon_rho/lat_rho or x_rho/y_rho, angle; reference: src/grid.F get_grid)
    and build the derived metric terms."""
    with open_dataset(path) as ds:
        def get(*names, required=True):
            for n in names:
                if n in ds:
                    return np.asarray(ds[n][...], np.float64)
            if required:
                raise KeyError(f"{path}: none of {names} found")
            return None

        h = get("h")
        if h.shape[-1] != cfg.nx + 2 or h.shape[-2] != cfg.ny + 2:
            raise ValueError(
                f"{path}: grid is {h.shape[-2]}x{h.shape[-1]} (eta,xi) but "
                f"config wants interior {cfg.ny}x{cfg.nx} "
                f"(expected {cfg.ny + 2}x{cfg.nx + 2} incl. boundary ring)")
        pm = get("pm")
        pn = get("pn")
        f = get("f")
        rmask = get("mask_rho", "rmask", required=False)
        if rmask is None:
            rmask = np.ones_like(h)
        xr = get("x_rho", "lon_rho", required=False)
        yr = get("y_rho", "lat_rho", required=False)
        angler = get("angle", "angler", required=False)

    P = lambda a: pad_field(a, cfg) if a is not None else None
    return build_grid(cfg, P(h), P(pm), P(pn), P(f), P(rmask),
                      xr=P(xr), yr=P(yr), dtype=dtype)


def read_init(path: str, cfg: ModelConfig, grid: Grid, record: int = -1,
              dtype=jnp.float64, tracer_names=None) -> OceanState:
    """Load initial conditions (zeta, ubar, vbar, u, v, temp[, salt], and
    any further tracers by their file variable names) from a ROMS
    initial/history file at `record` (reference: src/get_init.F; tracer
    variable naming: src/tracers.opt t_vname), then rebuild the vertical
    grid and derived fields."""
    from roms_tpu.ops import kinematics, kpp
    from roms_tpu.ops.eos import rho_eos
    from roms_tpu.parallel.halo import make_halo_fill, shift

    with open_dataset(path) as ds:
        def get(name, rec=record, required=True):
            if name not in ds:
                if required:
                    raise KeyError(f"{path}: missing {name}")
                return None
            var = ds[name]
            a = np.asarray(var[rec] if "time" in var.dims[0] else var[...],
                           np.float64)
            return a

        zeta = get("zeta")
        ubar = get("ubar")
        vbar = get("vbar")
        u = get("u")
        v = get("v")
        if tracer_names is None:
            tracer_names = ["temp"] + (["salt"] if cfg.salinity else [])
            tracer_names += [f"passive_{i:02d}"
                             for i in range(len(tracer_names), cfg.nt)]
        tracers = []
        for i, nm in enumerate(tracer_names):
            a = get(nm, required=(i < cfg.i_t_and_s))
            tracers.append(a if a is not None
                           else np.zeros_like(tracers[0]))
        tm = get("ocean_time", required=False)

    halo_fill = make_halo_fill(cfg)
    P = lambda a: halo_fill(jnp.asarray(pad_field(a, cfg), dtype))

    st = zeros_state(cfg, dtype)
    zeta_j = P(zeta)
    z_w, z_r, hz = vcoord.set_depth(zeta_j, grid.h, grid.hinv,
                                    grid.cs_w, grid.cs_r, cfg.hc, cfg.nz)
    z_w, z_r, hz = halo_fill(z_w), halo_fill(z_r), halo_fill(hz)
    u_j, v_j = P(u), P(v)
    ubar_j, vbar_j = P(ubar), P(vbar)
    t_j = jnp.stack([P(t) for t in tracers], axis=0)

    # initial fast-averaged transports from (zeta, ubar, vbar)
    # (reference: set_depth.F:42-63 iic==0 branch)
    du_avg1 = 0.5 * (grid.h + shift(grid.h, 0, -1)
                     + zeta_j + shift(zeta_j, 0, -1)) * grid.dn_u * ubar_j
    dv_avg1 = 0.5 * (grid.h + shift(grid.h, -1, 0)
                     + zeta_j + shift(zeta_j, -1, 0)) * grid.dm_v * vbar_j

    # solar penetration profile from the rest-state thickness, once
    # (reference: main.F:216-220 swr_frac at init)
    z_w0, _, hz0 = vcoord.set_depth(zeta_j * 0.0, grid.h, grid.hinv,
                                    grid.cs_w, grid.cs_r, cfg.hc, cfg.nz)
    st = st.replace(zeta=zeta_j, ubar=ubar_j, vbar=vbar_j,
                    u=u_j, v=v_j, u_prev=u_j, v_prev=v_j,
                    t=t_j, t_prev=t_j, z_w=z_w, z_r=z_r, hz=hz,
                    swrf=kpp.swr_frac(hz0, cfg),
                    du_avg1=halo_fill(du_avg1), dv_avg1=halo_fill(dv_avg1))

    flx_u, flx_v = kinematics.set_huv(st.u, st.v, hz, grid)
    flx_u, flx_v = halo_fill(flx_u), halo_fill(flx_v)
    om = kinematics.omega(flx_u, flx_v, z_w, hz, st.zeta * 0.0, grid,
                          0.6 * cfg.dt)
    eos0 = rho_eos(st.t, z_r, z_w, hz, grid.rmask, cfg)
    st = st.replace(flx_u=flx_u, flx_v=flx_v,
                    we=halo_fill(om.we), wi=halo_fill(om.wi), rho=eos0.rho)
    if tm is not None:
        st = st.replace(time=jnp.asarray(float(np.ravel(tm)[-1]
                                               if np.ndim(tm) else tm), dtype))
    return st
