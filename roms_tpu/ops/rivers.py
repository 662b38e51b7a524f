"""River point sources (reference: src/river_frc.F).

Rivers enter through faces between a land (masked) source cell and a water
cell.  The per-face array riv_uflx/riv_vflx encodes both the river index
and the fraction of that river's volume through the face as
±frac + 10*index; the decoding convention (nint(x/10) for the index,
x - 10*index for the signed fraction) follows the reference
(reference: pre_step3d4S.F:493-522, step2d_FB.F:531-554,
compute_horiz_tracer_fluxes.h:217-246).
"""

from __future__ import annotations

import jax.numpy as jnp

from roms_tpu.config import ModelConfig
from roms_tpu.parallel.halo import shift


def _decode(face_flx, riv_vol):
    """Return (active_mask, river_flux, frac) per face."""
    active = jnp.abs(face_flx) > 1.0e-3
    irv = jnp.rint(face_flx / 10.0).astype(jnp.int32)
    frac = face_flx - 10.0 * irv
    flux = jnp.take(riv_vol, jnp.clip(irv, 0, riv_vol.shape[0] - 1)) * frac
    return active, flux, irv


def depth_u(z_w):
    """0.5*(column depth + west-neighbor column depth) at u faces
    (reference: pre_step3d4S.F:497-498)."""
    d = z_w[-1] - z_w[0]
    return 0.5 * (d + shift(d, 0, -1))


def depth_v(z_w):
    d = z_w[-1] - z_w[0]
    return 0.5 * (d + shift(d, -1, 0))


def overwrite_uv(u, v, forcing, z_w, grid):
    """Force river face velocities over the whole column
    (reference: pre_step3d4S.F:493-522, step3d_uv2.F:689-717)."""
    au, fu, _ = _decode(forcing.riv_uflx, forcing.riv_vol)
    av, fv, _ = _decode(forcing.riv_vflx, forcing.riv_vol)
    uvel = fu / (grid.dn_u * depth_u(z_w))
    vvel = fv / (grid.dm_v * depth_v(z_w))
    u = jnp.where(au[None], uvel[None], u)
    v = jnp.where(av[None], vvel[None], v)
    return u, v


def overwrite_barotropic(ubar, vbar, du_avg1, dv_avg1, dnew, forcing, grid):
    """Force river barotropic velocities and fast-averaged fluxes
    (reference: step2d_FB.F:531-554)."""
    au, fu, _ = _decode(forcing.riv_uflx, forcing.riv_vol)
    av, fv, _ = _decode(forcing.riv_vflx, forcing.riv_vol)
    ubar = jnp.where(au, fu * 2.0 / (grid.dn_u * (dnew + shift(dnew, 0, -1))),
                     ubar)
    vbar = jnp.where(av, fv * 2.0 / (grid.dm_v * (dnew + shift(dnew, -1, 0))),
                     vbar)
    du_avg1 = jnp.where(au, fu, du_avg1)
    dv_avg1 = jnp.where(av, fv, dv_avg1)
    return ubar, vbar, du_avg1, dv_avg1


def tracer_flux_fix_all(fx, fe, hz, z_w, forcing, grid):
    """Replace advective tracer fluxes at river faces with the river's
    tracer load, batched over all tracers: fx/fe are (nt, nz, jy, ix)
    (reference: compute_horiz_tracer_fluxes.h:217-246)."""
    au, fu, iu = _decode(forcing.riv_uflx, forcing.riv_vol)
    av, fv, iv = _decode(forcing.riv_vflx, forcing.riv_vol)
    uvel = fu / depth_u(z_w)      # NOTE: no dn_u here (matches reference)
    vvel = fv / depth_v(z_w)
    nriv = forcing.riv_vol.shape[0]
    # (nt, jy, ix) river tracer concentration gathered at every face
    trc_u = jnp.moveaxis(forcing.riv_trc[jnp.clip(iu, 0, nriv - 1)], -1, 0)
    trc_v = jnp.moveaxis(forcing.riv_trc[jnp.clip(iv, 0, nriv - 1)], -1, 0)
    hzu = 0.5 * (hz + shift(hz, 0, -1))
    hzv = 0.5 * (hz + shift(hz, -1, 0))
    fx = jnp.where(au[None, None], trc_u[:, None] * (hzu * uvel[None])[None],
                   fx)
    fe = jnp.where(av[None, None], trc_v[:, None] * (hzv * vvel[None])[None],
                   fe)
    return fx, fe


def tracer_flux_fix(fx, fe, itrc, t_dummy, hz, z_w, forcing, grid):
    """Replace advective tracer fluxes at river faces with the river's
    tracer load (reference: compute_horiz_tracer_fluxes.h:217-246)."""
    au, fu, iu = _decode(forcing.riv_uflx, forcing.riv_vol)
    av, fv, iv = _decode(forcing.riv_vflx, forcing.riv_vol)
    uvel = fu / depth_u(z_w)      # NOTE: no dn_u here (matches reference)
    vvel = fv / depth_v(z_w)
    nriv = forcing.riv_vol.shape[0]
    trc_u = jnp.take(forcing.riv_trc[:, itrc], jnp.clip(iu, 0, nriv - 1))
    trc_v = jnp.take(forcing.riv_trc[:, itrc], jnp.clip(iv, 0, nriv - 1))
    hz_u = 0.5 * (hz + shift(hz, 0, -1))
    hz_v = 0.5 * (hz + shift(hz, -1, 0))
    fx = jnp.where(au[None], trc_u[None] * hz_u * uvel[None], fx)
    fe = jnp.where(av[None], trc_v[None] * hz_v * vvel[None], fe)
    return fx, fe
