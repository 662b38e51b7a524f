"""Tidal forcing: boundary harmonic tides + surface tidal potential
(reference: src/tides.F).

`ntides` harmonic constituents, each with complex amplitude fields:
boundary tides add `Re * cos(wT) - Im * sin(wT)` onto the per-edge
zeta/ubar/vbar boundary data (reference: tides.F:127-227), and the
potential tide sums the same harmonic over the whole domain into `ptide`,
applied as a surface pressure offset in the pressure-gradient kernel
(reference: tides.F:229-251, prsgrd.F:210 `P(N) -= g*ptide`).

Amplitudes are stored on the padded grid; the edge extraction uses the
same index map as the BC kernels (zeta/vbar at the ghost ring, ubar at the
boundary u-column).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from roms_tpu.config import ModelConfig
from roms_tpu.state import BoundaryData


@struct.dataclass
class TidalForcing:
    """Harmonic constituent data (reference: tides.F:21-26).

    All amplitude fields are (ntides, jy, ix) on the padded grid; any may
    be None (e.g. no potential tide).
    """
    ftide: jax.Array                       # (ntides,) frequencies [rad/s]
    ztide_re: Optional[jax.Array] = None   # free-surface amplitude [m]
    ztide_im: Optional[jax.Array] = None
    utide_re: Optional[jax.Array] = None   # barotropic u amplitude [m/s]
    utide_im: Optional[jax.Array] = None
    vtide_re: Optional[jax.Array] = None
    vtide_im: Optional[jax.Array] = None
    ptide_re: Optional[jax.Array] = None   # equilibrium-tide potential [m]
    ptide_im: Optional[jax.Array] = None

    @property
    def bry_tides(self) -> bool:
        return self.ztide_re is not None

    @property
    def pot_tides(self) -> bool:
        return self.ptide_re is not None


def _harm(re, im, cosw, sinw):
    """sum_k re_k cos(w_k T) - im_k sin(w_k T) over constituents."""
    shape = (slice(None),) + (None,) * (re.ndim - 1)
    return jnp.sum(re * cosw[shape] - im * sinw[shape], axis=0)


def set_tides(tides: TidalForcing, time, cfg: ModelConfig,
              bry: Optional[BoundaryData] = None,
              add_to_bry: bool = True):
    """Evaluate tidal boundary data and potential at the half-step time
    omT = ftide*(time + dt/2) (reference: tides.F:129).

    Returns (bry_out, ptide).  When `add_to_bry`, harmonic values are ADDED
    to the existing boundary data (slowly-varying OBC data + tides, as the
    reference does after set_bry_all); otherwise they replace it.
    """
    om = tides.ftide * (time + 0.5 * cfg.dt)
    cosw, sinw = jnp.cos(om), jnp.sin(om)

    ptide = None
    if tides.pot_tides:
        ptide = _harm(tides.ptide_re, tides.ptide_im, cosw, sinw)

    if not tides.bry_tides:
        return bry, ptide

    z = _harm(tides.ztide_re, tides.ztide_im, cosw, sinw)
    u = _harm(tides.utide_re, tides.utide_im, cosw, sinw)
    v = _harm(tides.vtide_re, tides.vtide_im, cosw, sinw)

    def base(name, shape_src):
        cur = getattr(bry, name, None) if bry is not None else None
        if cur is not None and add_to_bry:
            return cur
        return jnp.zeros_like(shape_src)

    kw = {}
    # edge extraction (reference: tides.F:133-226); index map in ops/bc.py
    if cfg.obc_west:
        kw["zeta_west"] = base("zeta_west", z[:, 1]) + z[:, 1]
        kw["ubar_west"] = base("ubar_west", u[:, 2]) + u[:, 2]
        kw["vbar_west"] = base("vbar_west", v[:, 1]) + v[:, 1]
    if cfg.obc_east:
        kw["zeta_east"] = base("zeta_east", z[:, -2]) + z[:, -2]
        kw["ubar_east"] = base("ubar_east", u[:, -2]) + u[:, -2]
        kw["vbar_east"] = base("vbar_east", v[:, -2]) + v[:, -2]
    if cfg.obc_south:
        kw["zeta_south"] = base("zeta_south", z[1, :]) + z[1, :]
        kw["ubar_south"] = base("ubar_south", u[1, :]) + u[1, :]
        kw["vbar_south"] = base("vbar_south", v[2, :]) + v[2, :]
    if cfg.obc_north:
        kw["zeta_north"] = base("zeta_north", z[-2, :]) + z[-2, :]
        kw["ubar_north"] = base("ubar_north", u[-2, :]) + u[-2, :]
        kw["vbar_north"] = base("vbar_north", v[-2, :]) + v[-2, :]

    bry_out = (bry if bry is not None else BoundaryData()).replace(**kw)
    return bry_out, ptide
