"""True (absolute) vertical velocity diagnostic at RHO points
(reference: src/wvlcty.F wvlcty_tile).

Three contributions: the omega-like vertical velocity from bottom-up flux
-divergence integration (WITHOUT the moving-grid "breathing" subtraction,
and immediately scaled by pm*pn so it is a velocity), interpolated to
vertical RHO points with the reference's 4th-order stencil; plus the
projection of quasi-horizontal motion along the sloping S surfaces.
Purely diagnostic — no feedback on the model (reference: wvlcty.F:20-26).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from roms_tpu.config import ModelConfig
from roms_tpu.parallel.halo import band, eset, shift


def wvlcty(u, v, flx_u, flx_v, z_r, grid, cfg: ModelConfig):
    """(nz, jy, ix) absolute vertical velocity [m/s] at rho points."""
    pmn = grid.pm * grid.pn

    # bottom-up integral of flux divergence, scaled to velocity
    # (reference: wvlcty.F:62-84)
    div = -(pmn[None] * (shift(flx_u, 0, 1) - flx_u
                         + shift(flx_v, 1, 0) - flx_v))
    wrk_body = lax.associative_scan(jnp.add, div, axis=0)   # Wrk[1..N]
    wrk = jnp.concatenate([jnp.zeros_like(wrk_body[:1]), wrk_body], axis=0)

    nz = div.shape[0]
    # 4th-order interpolation of interface values to rho points
    # (reference: wvlcty.F:85-98)
    mid = (0.5625 * (wrk[2:nz] + wrk[1:nz - 1])
           - 0.0625 * (wrk[3:nz + 1] + wrk[0:nz - 2]))
    top = 0.375 * wrk[nz] + 0.75 * wrk[nz - 1] - 0.125 * wrk[nz - 2]
    bot = -0.125 * wrk[2] + 0.75 * wrk[1] + 0.375 * wrk[0]
    wvlc = jnp.concatenate([bot[None], mid, top[None]], axis=0)

    # projection of horizontal motion on the S-surface slopes
    # (reference: wvlcty.F:101-124)
    wxi = u * (z_r - shift(z_r, 0, -1)) * (grid.pm + shift(grid.pm, 0, -1))
    weta = v * (z_r - shift(z_r, -1, 0)) * (grid.pn + shift(grid.pn, -1, 0))
    wvlc = wvlc + 0.25 * (wxi + shift(wxi, 0, 1) + weta + shift(weta, 1, 0))

    # gradient lateral BCs at physical edges (reference: wvlcty.F:139-180)
    pe, pn_ = cfg.pad_e, cfg.pad_n
    if not cfg.ew_periodic:
        wvlc = eset(wvlc, (Ellipsis, slice(None), 1), wvlc[..., :, 2],
                    grid.own_w)
        wvlc = eset(wvlc, (Ellipsis, slice(None), -2 - pe),
                    wvlc[..., :, -3 - pe], grid.own_e)
    if not cfg.ns_periodic:
        wvlc = eset(wvlc, (Ellipsis, 1, slice(None)), wvlc[..., 2, :],
                    grid.own_s)
        wvlc = eset(wvlc, (Ellipsis, -2 - pn_, slice(None)),
                    wvlc[..., -3 - pn_, :], grid.own_n)
    if cfg.masking:
        wvlc = wvlc * grid.rmask[None]
    return wvlc
