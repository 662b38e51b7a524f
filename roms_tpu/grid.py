"""Horizontal curvilinear grid and derived metric terms.

Holds what the reference keeps in module `grid` (reference: src/grid.F) plus
the metric combinations of setup_grid1 (reference: src/setup_grid1.F) and the
global invariants of setup_grid2 (reference: src/setup_grid2.F: area, volume,
hmin/hmax).  All horizontal fields are padded with `halo` ghost cells and are
(j, i)-indexed with i fastest.

Coordinate variables and Coriolis are computed on the extended index range
and are NOT halo-exchanged (they would conflict with periodicity; reference:
src/setup_grid1.F:28-32) — the analytic cases evaluate them directly on the
extended range exactly like ana_grid (reference: tests/Filament/ana_grid.h).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from roms_tpu.config import ModelConfig
from roms_tpu.parallel.halo import shift
from roms_tpu import vcoord


@struct.dataclass
class Grid:
    # --- primary fields (padded (ny+2h, nx+2h)) ---------------------------
    h: jax.Array        # bathymetry [m]
    hinv: jax.Array     # 1/(h+hc)  (reference: set_depth.F:45)
    pm: jax.Array       # 1/dx at rho points
    pn: jax.Array       # 1/dy at rho points
    f: jax.Array        # Coriolis parameter
    fomn: jax.Array     # f/(pm*pn) (reference: setup_grid1.F:52)
    rmask: jax.Array
    umask: jax.Array
    vmask: jax.Array
    pmask: jax.Array
    xr: jax.Array       # x of rho points (analytic cases)
    yr: jax.Array
    # --- metric combinations (reference: setup_grid1.F:80-135) ------------
    dm_r: jax.Array     # 1/pm
    dn_r: jax.Array     # 1/pn
    dm_u: jax.Array     # 2/(pm_i + pm_{i-1})
    dn_u: jax.Array
    dm_v: jax.Array
    dn_v: jax.Array
    dm_p: jax.Array
    dn_p: jax.Array
    pm_u: jax.Array     # 0.5*(pm_i + pm_{i-1})
    pn_u: jax.Array
    pm_v: jax.Array
    pn_v: jax.Array
    pmon_u: jax.Array   # (pm/pn) at u
    pnom_v: jax.Array   # (pn/pm) at v
    dndx: Optional[jax.Array]   # curvilinear terms (CURVGRID)
    dmde: Optional[jax.Array]
    # --- vertical stretching curves ---------------------------------------
    cs_w: jax.Array     # (nz+1,)
    cs_r: jax.Array     # (nz,)
    # --- global invariants (scalars; deterministic f64 sums at setup) -----
    area: jax.Array
    volume: jax.Array
    # --- sponge-enhanced mixing coefficients (reference: src/set_nudgcof.F,
    # src/mixing.F visc2_r/visc2_p/diff2); None = use scalar cfg values ----
    visc2_r: Optional[jax.Array] = None
    visc2_p: Optional[jax.Array] = None
    diff2: Optional[jax.Array] = None
    # --- distributed edge ownership (set inside shard_map only) ------------
    # Scalar bools: does this shard's block touch the given physical domain
    # edge?  None (single block) means "owns every edge".  The TPU analog of
    # the reference's edge-rank tests (reference: src/mpi_setup.F:115-155
    # inode/jnode edge logic, src/hidden_mpi_vars.F west_msg_exch flags).
    own_w: Optional[jax.Array] = None
    own_e: Optional[jax.Array] = None
    own_s: Optional[jax.Array] = None
    own_n: Optional[jax.Array] = None
    # Offsets of this block's origin within the padded global array (for
    # converting global point-source indices to local ones); None = 0.
    j0: Optional[jax.Array] = None
    i0: Optional[jax.Array] = None


def build_grid(cfg: ModelConfig, h, pm, pn, f, rmask, xr=None, yr=None,
               dtype=jnp.float64) -> Grid:
    """Derive all metric combinations from primary grid fields.

    Inputs are padded arrays (ny+2h, nx+2h).  Mirrors setup_grid1
    (reference: src/setup_grid1.F:59-211) — computed over the full extended
    range (ghosts of the inputs must already be consistent, e.g. periodic
    or analytically extended), so no exchange is needed afterwards.
    """
    h = jnp.asarray(h, dtype)
    pm = jnp.asarray(pm, dtype)
    pn = jnp.asarray(pn, dtype)
    f = jnp.asarray(f, dtype)
    rmask = jnp.asarray(rmask, dtype)
    if xr is None:
        xr = jnp.zeros_like(h)
    if yr is None:
        yr = jnp.zeros_like(h)

    fomn = f / (pm * pn)
    dm_r = 1.0 / pm
    dn_r = 1.0 / pn

    pm_w = shift(pm, 0, -1)   # pm(i-1,j)
    pn_w = shift(pn, 0, -1)
    pm_s = shift(pm, -1, 0)   # pm(i,j-1)
    pn_s = shift(pn, -1, 0)

    dm_u = 2.0 / (pm + pm_w)
    dn_u = 2.0 / (pn + pn_w)
    pm_u = 0.5 * (pm + pm_w)
    pn_u = 0.5 * (pn + pn_w)
    pmon_u = (pm + pm_w) / (pn + pn_w)

    dm_v = 2.0 / (pm + pm_s)
    dn_v = 2.0 / (pn + pn_s)
    pm_v = 0.5 * (pm + pm_s)
    pn_v = 0.5 * (pn + pn_s)
    pnom_v = (pn + pn_s) / (pm + pm_s)

    pm_sw = shift(pm, -1, -1)
    pn_sw = shift(pn, -1, -1)
    dm_p = 4.0 / (pm + pm_w + pm_s + pm_sw)
    dn_p = 4.0 / (pn + pn_w + pn_s + pn_sw)

    umask = rmask * shift(rmask, 0, -1)
    vmask = rmask * shift(rmask, -1, 0)
    # psi mask with no-slip weighting (reference: setup_grid1.F:150-190):
    # 1 if all 4 corners water; cff1=1 if exactly one land; cff2=2 if two
    # diagonal/adjacent-specific patterns; else 0.  cff1=1 makes the simple
    # product form below exact for 0- and 1-land cases; the 2-water cases
    # give 2.  Reproduce the table directly.
    r00 = rmask
    r10 = shift(rmask, 0, -1)
    r01 = shift(rmask, -1, 0)
    r11 = shift(rmask, -1, -1)
    nwater = r00 + r10 + r01 + r11
    pmask = jnp.where(nwater >= 3.0, 1.0, jnp.where(nwater == 2.0, 2.0, 0.0))
    pmask = pmask.astype(dtype)

    if cfg.curvgrid:
        dndx = 0.5 / shift(pn, 0, 1) - 0.5 / shift(pn, 0, -1)
        dmde = 0.5 / shift(pm, 1, 0) - 0.5 / shift(pm, -1, 0)
    else:
        dndx = None
        dmde = None

    cs_w, cs_r = vcoord.stretching_curves(cfg.nz, cfg.theta_s, cfg.theta_b)

    # global invariants over the interior (reference: setup_grid2.F:97-106)
    hl = cfg.halo
    intr = (slice(hl, -hl), slice(hl, -hl))
    dA = np.asarray(rmask[intr] / (pm[intr] * pn[intr]), np.float64)
    area = dA.sum()
    volume = (dA * np.asarray(h[intr], np.float64)).sum()

    return Grid(
        h=h, hinv=1.0 / (h + cfg.hc), pm=pm, pn=pn, f=f, fomn=fomn,
        rmask=rmask, umask=umask, vmask=vmask, pmask=pmask,
        xr=jnp.asarray(xr, dtype), yr=jnp.asarray(yr, dtype),
        dm_r=dm_r, dn_r=dn_r, dm_u=dm_u, dn_u=dn_u, dm_v=dm_v, dn_v=dn_v,
        dm_p=dm_p, dn_p=dn_p, pm_u=pm_u, pn_u=pn_u, pm_v=pm_v, pn_v=pn_v,
        pmon_u=pmon_u, pnom_v=pnom_v, dndx=dndx, dmde=dmde,
        cs_w=jnp.asarray(cs_w, dtype), cs_r=jnp.asarray(cs_r, dtype),
        area=jnp.asarray(area, dtype), volume=jnp.asarray(volume, dtype),
    )


def grid_stiffness(z_w, grid, cfg: ModelConfig):
    """Maximum grid stiffness ratios rx0 (Beckmann-Haidvogel, bottom
    slope) and rx1 (Haney, layer-interface slope) over unmasked u/v faces
    of the interior — purely diagnostic (reference: src/grid_stiffness.F
    grid_stiffness_tile; printed at init, main.F:223-225).

    z_w: (nz+1, jy, ix) rest-state interface depths.  Returns
    (rx0, rx1) floats."""
    import numpy as np

    zw = np.asarray(z_w, np.float64)
    h_ = cfg.halo

    def face_ratios(zw_m, zw_p, mask):
        # zw_m/zw_p: (nz+1, ...) at the two cells of each face
        r0 = np.abs((zw_p[0] - zw_m[0]) / (zw_p[0] + zw_m[0]))
        num = (zw_p[1:] - zw_m[1:] + zw_p[:-1] - zw_m[:-1])
        den = (zw_p[1:] + zw_m[1:] - zw_p[:-1] - zw_m[:-1])
        r1 = np.abs(num / den).max(axis=0)
        if mask is not None:
            keep = np.asarray(mask, np.float64) > 0.5
            r0 = np.where(keep, r0, 0.0)
            r1 = np.where(keep, r1, 0.0)
        return r0, r1

    sl = (slice(h_, -h_), slice(h_, -h_))
    um = np.asarray(grid.umask)[sl] if cfg.masking else None
    vm = np.asarray(grid.vmask)[sl] if cfg.masking else None
    # u faces: cell (j, i) vs (j, i-1); v faces: (j, i) vs (j-1, i)
    r0u, r1u = face_ratios(zw[:, h_:-h_, h_ - 1:-h_ - 1],
                           zw[:, h_:-h_, h_:-h_], um)
    r0v, r1v = face_ratios(zw[:, h_ - 1:-h_ - 1, h_:-h_],
                           zw[:, h_:-h_, h_:-h_], vm)
    rx0 = max(float(r0u.max()), float(r0v.max()))
    rx1 = max(float(r1u.max()), float(r1v.max()))
    return rx0, rx1
