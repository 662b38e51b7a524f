"""mCDR (marine carbon dioxide removal) release forcing
(reference: src/cdr_frc.F).

Three forcing modes, matching the reference exactly:
  (1) parameterized releases — point/Gaussian horizontal footprint with a
      Gaussian (or single-level) vertical profile (cdr_frc.F:403-493);
  (2) vertical profiles ("upscaling" input) — per-release source-grid
      profiles conservatively remapped onto the local model levels
      (cdr_frc.F:433-439, vertical_remapping.F);
  (3) full-3D ALK/DIC flux fields (cdr_frc.F:111-114).

Release construction is host-side numpy at init (and at forcing refresh for
mode 2); the per-step application is a dense masked add or a sparse
scatter-add inside the jitted tracer step
(reference: step3d_t_ISO.F:859-902).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from roms_tpu.config import ModelConfig
from roms_tpu.remap import remap_src_to_grid

EARTH_RADIUS = 6371315.0  # [m]


@struct.dataclass
class CdrForcing:
    """Device-side release data.

    Sparse form (modes 1-2): `iloc/jloc` (nprf,) padded-grid indices,
    `icdr` (nprf,) release ids, `prf` (nprf, nt, nz) normalized vertical
    weights (global sum over a release = 1), `flx` (ncdr, nt) tracer flux
    [C m^3/s].  Dense form (mode 3): `flx_3d` (nt, nz, jy, ix).
    """
    iloc: Optional[jax.Array] = None
    jloc: Optional[jax.Array] = None
    icdr: Optional[jax.Array] = None
    prf: Optional[jax.Array] = None
    flx: Optional[jax.Array] = None
    flx_3d: Optional[jax.Array] = None


def ll2dist(lon, lat, lon0, lat0):
    """Great-circle distance [m] (reference: cdr_frc.F ll2dist)."""
    d2r = np.pi / 180.0
    la, la0 = lat * d2r, lat0 * d2r
    dlo = (lon - lon0) * d2r
    dla = la - la0
    a = np.sin(dla / 2) ** 2 + np.cos(la) * np.cos(la0) * np.sin(dlo / 2) ** 2
    return 2.0 * EARTH_RADIUS * np.arcsin(np.minimum(1.0, np.sqrt(a)))


def _release_footprints(cfg: ModelConfig, lon_r, lat_r, rmask, cdr_lon,
                        cdr_lat, cdr_hsc, xy_dist=False):
    """Horizontal fractional footprint per release
    (reference: cdr_frc.F:294-401 find_release_locations).

    Returns (fracs (ncdr, jy, ix) numpy, nearest (ncdr, 2) indices).
    Only interior points (Fortran 1..n) are eligible.
    """
    h = cfg.halo
    jy, ix = cfg.ny + 2 * h, cfg.nx + 2 * h
    ncdr = len(cdr_lon)
    interior = np.zeros((jy, ix), bool)
    interior[h:-h, h:-h] = True
    fracs = np.zeros((ncdr, jy, ix))
    nearest = np.zeros((ncdr, 2), np.int64)
    for ic in range(ncdr):
        if xy_dist:
            dist = np.hypot(lon_r - cdr_lon[ic], lat_r - cdr_lat[ic])
        else:
            dist = ll2dist(lon_r, lat_r, cdr_lon[ic], cdr_lat[ic])
        dist = np.where(interior, dist, 1e6)
        jn, in_ = np.unravel_index(np.argmin(dist), dist.shape)
        nearest[ic] = (jn, in_)
        if cdr_hsc is None or cdr_hsc[ic] == 0:
            fracs[ic, jn, in_] = 1.0
        else:
            f = np.exp(-(dist / cdr_hsc[ic]) ** 2)
            f = np.where(interior & (rmask > 0) & (f > 1e-3), f, 0.0)
            if not f.any():
                f[jn, in_] = 1.0  # tiny-hscl fallback (cdr_frc.F:366-372)
            fracs[ic] = f
    return fracs, nearest


def parameterized_releases(cfg: ModelConfig, grid, z_r0, hz0,
                           cdr_lon: Sequence[float], cdr_lat: Sequence[float],
                           cdr_dep: Sequence[float], cdr_hsc: Sequence[float],
                           cdr_vsc: Sequence[float],
                           flx: np.ndarray, xy_dist: bool = False,
                           dtype=jnp.float64) -> CdrForcing:
    """Mode (1): build sparse releases with analytic Gaussian structure
    (reference: cdr_frc.F:264-292 init + :403-493 vertical structure).

    z_r0/hz0: rest-state level depths/thicknesses (nz, jy, ix), numpy-like.
    flx: (ncdr, nt) tracer flux [C m^3/s] (= cdr_vol*cdr_trc when driven by
    volume+concentration series, reference: cdr_frc.F:117-123).
    """
    lon_r = np.asarray(grid.xr, np.float64)
    lat_r = np.asarray(grid.yr, np.float64)
    rmask = np.asarray(grid.rmask, np.float64)
    z_r0 = np.asarray(z_r0, np.float64)
    hz0 = np.asarray(hz0, np.float64)
    nz = cfg.nz
    ncdr = len(cdr_lon)

    fracs, nearest = _release_footprints(cfg, lon_r, lat_r, rmask,
                                         cdr_lon, cdr_lat, cdr_hsc,
                                         xy_dist=xy_dist)
    ilocs, jlocs, icdrs, prfs = [], [], [], []
    for ic in range(ncdr):
        js, is_ = np.nonzero(fracs[ic] > (1e-3 if cdr_hsc[ic] else 0.0))
        cols = []
        for j, i in zip(js, is_):
            if cdr_vsc[ic] == 0:
                # single nearest level (reference: cdr_frc.F:443-448)
                k = int(np.argmin(np.abs(z_r0[:, j, i] + cdr_dep[ic])))
                p = np.zeros(nz)
                p[k] = fracs[ic, j, i]
            else:
                arg = ((z_r0[:, j, i] + cdr_dep[ic]) / cdr_vsc[ic]) ** 2
                p = np.exp(-arg) * hz0[:, j, i]
                vint = cdr_vsc[ic] * np.sqrt(np.pi)
                p = fracs[ic, j, i] * p / vint
            cols.append(p)
            ilocs.append(i)
            jlocs.append(j)
            icdrs.append(ic)
        # normalize so the global injection equals flx exactly
        # (reference: cdr_frc.F:468-489)
        block = np.asarray(cols)           # (nloc, nz)
        tot = block.sum()
        if tot > 0:
            block /= tot
        prfs.extend(np.broadcast_to(block[:, None, :],
                                    (block.shape[0], cfg.nt, nz)).copy())

    nprf = len(ilocs)
    return CdrForcing(
        iloc=jnp.asarray(np.asarray(ilocs, np.int32)),
        jloc=jnp.asarray(np.asarray(jlocs, np.int32)),
        icdr=jnp.asarray(np.asarray(icdrs, np.int32)),
        prf=jnp.asarray(np.asarray(prfs).reshape(nprf, cfg.nt, nz), dtype),
        flx=jnp.asarray(np.asarray(flx), dtype))


def profile_releases(cfg: ModelConfig, grid, hz,
                     cdr_lon, cdr_lat,
                     cdr_hz_src: np.ndarray, cdr_flx_dp: np.ndarray,
                     tracer_indices: Sequence[int],
                     flx: Optional[np.ndarray] = None,
                     xy_dist: bool = False, dtype=jnp.float64) -> CdrForcing:
    """Mode (2): single-point releases whose vertical structure comes from
    source-grid profiles, conservatively remapped onto the local column
    (reference: cdr_frc.F:189-243, :433-439).

    cdr_hz_src: (ncdr, n_src) source layer thicknesses;
    cdr_flx_dp: (ncdr, len(tracer_indices), n_src) source profiles;
    tracer_indices: which model tracers receive each profile row (the
    reference hardwires (iALK, iDIC), cdr_frc.F:236-238).
    """
    lon_r = np.asarray(grid.xr, np.float64)
    lat_r = np.asarray(grid.yr, np.float64)
    rmask = np.asarray(grid.rmask, np.float64)
    hz = np.asarray(hz, np.float64)
    ncdr = len(cdr_lon)
    nz = cfg.nz

    fracs, nearest = _release_footprints(cfg, lon_r, lat_r, rmask,
                                         cdr_lon, cdr_lat, None,
                                         xy_dist=xy_dist)
    ilocs, jlocs, icdrs, prfs = [], [], [], []
    for ic in range(ncdr):
        j, i = nearest[ic]
        p = np.zeros((cfg.nt, nz))
        for row, itrc in enumerate(tracer_indices):
            p[itrc] = remap_src_to_grid(cdr_hz_src[ic], cdr_flx_dp[ic, row],
                                        hz[:, j, i])
        ilocs.append(i)
        jlocs.append(j)
        icdrs.append(ic)
        prfs.append(p)

    if flx is None:
        flx = np.zeros((ncdr, cfg.nt))
        flx[:, list(tracer_indices)] = 1.0  # (reference: cdr_frc.F:240-241)
    return CdrForcing(
        iloc=jnp.asarray(np.asarray(ilocs, np.int32)),
        jloc=jnp.asarray(np.asarray(jlocs, np.int32)),
        icdr=jnp.asarray(np.asarray(icdrs, np.int32)),
        prf=jnp.asarray(np.asarray(prfs), dtype),
        flx=jnp.asarray(np.asarray(flx), dtype))


def cdr_3d(cfg: ModelConfig, flx_3d: np.ndarray, dtype=jnp.float64) -> CdrForcing:
    """Mode (3): dense per-cell tracer injection rate (nt, nz, jy, ix)
    [C m^3/s per cell]: applied as dt*pm*pn*flx onto the Hz-weighted
    tracer, so the domain tracer content rises by sum(flx_3d)*dt per step
    (reference: step3d_t_ISO.F:862-881)."""
    return CdrForcing(flx_3d=jnp.asarray(flx_3d, dtype))


def apply_cdr_all(t_rhs, cdr: CdrForcing, pmn, dt, j0=None, i0=None):
    """Add the CDR source onto the Hz-weighted tracer r.h.s. for all
    tracers at once: t_rhs is (nt, nz, jy, ix)
    (reference: step3d_t_ISO.F:859-902).

    j0/i0: block offsets inside shard_map (grid.j0/i0); release indices are
    global padded-array indices, converted to block-local here and dropped
    when outside this block (reference: cdr_frc.F per-rank release search).
    """
    if cdr is None:
        return t_rhs
    out = t_rhs
    if cdr.flx_3d is not None:
        out = out + dt * pmn[None, None] * cdr.flx_3d
    if cdr.prf is not None and cdr.prf.shape[0] > 0:
        amp = cdr.prf * cdr.flx[cdr.icdr][:, :, None]             # (nprf, nt, nz)
        jl, il = cdr.jloc, cdr.iloc
        if j0 is not None:
            jl = jl - j0
            il = il - i0
            jy, ix = t_rhs.shape[-2:]
            inb = (jl >= 0) & (jl < jy) & (il >= 0) & (il < ix)
            jl = jnp.where(inb, jl, 0)
            il = jnp.where(inb, il, 0)
            amp = amp * inb[:, None, None]
        incr = dt * pmn[jl, il][:, None, None] * amp              # (nprf, nt, nz)
        out = out.at[:, :, jl, il].add(jnp.moveaxis(incr, 0, -1))
    return out


def apply_cdr(t_rhs_itrc, itrc: int, cdr: CdrForcing, pmn, dt):
    """Add the CDR source for tracer itrc onto the Hz-weighted tracer
    r.h.s. (nz, jy, ix) (reference: step3d_t_ISO.F:859-902)."""
    if cdr is None:
        return t_rhs_itrc
    out = t_rhs_itrc
    if cdr.flx_3d is not None:
        out = out + dt * pmn[None] * cdr.flx_3d[itrc]
    if cdr.prf is not None and cdr.prf.shape[0] > 0:
        amp = cdr.prf[:, itrc, :] * cdr.flx[cdr.icdr, itrc][:, None]  # (nprf, nz)
        incr = dt * pmn[cdr.jloc, cdr.iloc][:, None] * amp            # (nprf, nz)
        out = out.at[:, cdr.jloc, cdr.iloc].add(incr.T)
    return out
