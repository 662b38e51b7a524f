"""Rotated (isoneutral) biharmonic tracer diffusion
(reference: cppdefs ADV_ISONEUTRAL; src/step3d_t_ISO.F:255-850 the two
rotated Laplacian passes with SW_TRIADS upwinded slope triads and the
STABILIZE implicit/explicit vertical split; slope ingredients from
src/prsgrd.F:306-336 dRdx/dRde and src/step3d_uv2.F:571-683
diff3u/diff3v + idRz).

The reference's recursive (k1/k2 plane-swapping) per-tile loops become
whole-field array ops: interfaces carried as an (nz+1, jy, ix) axis so the
pair of rotated Laplacians is one fused XLA computation per tracer.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from roms_tpu.config import ModelConfig
from roms_tpu.ops.eos import QP2
from roms_tpu.parallel.halo import shift

import numpy as np

GAMMA = 0.0833333333333   # hyperdiffusivity scale (step3d_uv2.F:77)
ALPHA_MAX = 2.0           # max isoneutral slope factor (step3d_uv2.F:76)
EPSIL = 1e-33
# numpy (not jnp): this module is imported lazily inside a trace, and a
# module-level jnp constant would leak a tracer
SW_WGT = np.asarray([0.0, 1.0, 0.5, 1.0 / 3.0, 0.25])
BL_THICK = 50.0           # boundary-layer taper floor [m] (step3d_uv2.F:662)


class IsoFields(NamedTuple):
    drdx: jax.Array    # (nz, jy, ix) adiabatic x density slope term at u
    drde: jax.Array    # at v
    idrz: jax.Array    # (nz-1, jy, ix) limited inverse d(rho)/dz, interfaces
    diff3u: jax.Array  # sqrt of hyperdiffusivity at u (nz, jy, ix)
    diff3v: jax.Array


def _adiabatic_dx(rho, rho1, qp1, z_r, sh, cfg):
    """Adiabatic elementary density difference (SPLIT_EOS aware,
    reference: prsgrd.F rx)."""
    if cfg.nonlin_eos:
        dpth = -0.5 * (z_r + sh(z_r, -1))
        return (rho1 - sh(rho1, -1)
                + (qp1 - sh(qp1, -1)) * dpth * (1.0 - QP2 * dpth))
    return rho - sh(rho, -1)


def slope_fields(rho, rho1, qp1, z_r, z_w, hz, hbls, hbbl,
                 u_new, v_new, grid, cfg: ModelConfig) -> IsoFields:
    """All geometric/coefficient inputs of the rotated operator."""
    r0g = cfg.rho0 / cfg.g
    nz = cfg.nz

    # --- dRdx at u points (reference: prsgrd.F:316-329) -------------------
    shx = lambda a, d: shift(a, 0, d)
    rx = _adiabatic_dx(rho, rho1, qp1, z_r, shx, cfg)
    if cfg.masking:
        rx = rx * grid.umask[None]
    f_u2 = (0.5 * (grid.f + shx(grid.f, -1))) ** 2
    drdx = grid.pm_u[None] * (
        r0g * f_u2[None] * (z_r - shx(z_r, -1))
        - 0.5 * rx - 0.25 * (shx(rx, -1) + shx(rx, 1)))

    she = lambda a, d: shift(a, d, 0)
    re = _adiabatic_dx(rho, rho1, qp1, z_r, she, cfg)
    if cfg.masking:
        re = re * grid.vmask[None]
    f_v2 = (0.5 * (grid.f + she(grid.f, -1))) ** 2
    drde = grid.pn_v[None] * (
        r0g * f_v2[None] * (z_r - she(z_r, -1))
        - 0.5 * re - 0.25 * (she(re, -1) + she(re, 1)))

    # --- idRz at interfaces k=1..N-1 (reference: step3d_uv2.F:622-683) ----
    if cfg.nonlin_eos:
        dpth = -0.5 * (z_r[1:] + z_r[:-1])
        drz = (rho1[:-1] - rho1[1:]
               + (qp1[:-1] - qp1[1:]) * dpth * (1.0 - 2.0 * QP2 * dpth))
    else:
        drz = rho[:-1] - rho[1:]
    dz = z_r[1:] - z_r[:-1]
    drz = jnp.maximum(drz, 0.0) + r0g * grid.f[None] ** 2 * dz

    adx = jnp.abs(drdx)
    ade = jnp.abs(drde)
    adx_if = jnp.maximum(adx[:-1], adx[1:])     # max over cells k, k+1
    ade_if = jnp.maximum(ade[:-1], ade[1:])
    drx_max = jnp.maximum(
        jnp.maximum(grid.dm_u[None] * adx_if,
                    shx(grid.dm_u, 1)[None] * shx(adx_if, 1)),
        jnp.maximum(grid.dn_v[None] * ade_if,
                    she(grid.dn_v, 1)[None] * she(ade_if, 1)))

    zw_if = z_w[1:nz]     # interface heights k=1..N-1
    if cfg.lmd_kpp:
        cfs = jnp.minimum(1.0, (z_w[nz][None] - zw_if)
                          / jnp.maximum(BL_THICK, hbls)[None])
        cfb = jnp.minimum(1.0, (zw_if - z_w[0][None])
                          / jnp.maximum(BL_THICK, hbbl)[None])
    else:
        cfs = jnp.minimum(1.0, (z_w[nz][None] - zw_if) / BL_THICK)
        cfb = jnp.minimum(1.0, (zw_if - z_w[0][None]) / BL_THICK)
    cff = ALPHA_MAX * cfs * (2.0 - cfs) * cfb * (2.0 - cfb)
    idrz = cff / jnp.maximum(jnp.maximum(cff * drz, drx_max), EPSIL)

    # --- sqrt hyperdiffusivities (reference: step3d_uv2.F:571-618) --------
    diff3u = jnp.sqrt(GAMMA * jnp.abs(u_new) * grid.dm_u[None]) \
        * grid.dm_u[None]
    diff3v = jnp.sqrt(GAMMA * jnp.abs(v_new) * grid.dn_v[None]) \
        * grid.dn_v[None]
    return IsoFields(drdx=drdx, drde=drde, idrz=idrz,
                     diff3u=diff3u, diff3v=diff3v)


def _interfaces(T, iso: IsoFields, z_r):
    """dT/dz (scaled by idRz) at all nz+1 interfaces, plus the FSC metric
    (reference: step3d_t_ISO.F:317-345)."""
    dt_in = iso.idrz * (T[1:] - T[:-1])
    dt_if = jnp.concatenate([dt_in[:1], dt_in, dt_in[-1:]], axis=0)
    zero = jnp.zeros_like(dt_in[:1])
    fsc_m = jnp.concatenate([zero, iso.idrz * (z_r[1:] - z_r[:-1]), zero],
                            axis=0)
    return dt_if, fsc_m


def _rot_fluxes(T, iso: IsoFields, hz, z_r, grid, cfg: ModelConfig,
                sign: float, t_stab=None):
    """One rotated Laplacian's fluxes: FX (u), FE (v) per cell and FSC at
    interfaces (reference: step3d_t_ISO.F first pass :305-512, second pass
    with sign=-1 :620-825).  With cfg.stabilize and t_stab given (second
    pass), also returns the implicit stabilization diffusivity Akz."""
    shx = lambda a, d: shift(a, 0, d)
    she = lambda a, d: shift(a, d, 0)
    dt_if, fsc_m = _interfaces(T, iso, z_r)

    dtdx = grid.pm_u[None] * (T - shx(T, -1))
    dtde = grid.pn_v[None] * (T - she(T, -1))
    if cfg.masking:
        dtdx = dtdx * grid.umask[None]
        dtde = dtde * grid.vmask[None]

    dt_if_w = shx(dt_if, -1)
    dt_if_s = she(dt_if, -1)
    lo, hi = dt_if[:-1], dt_if[1:]          # per-cell interface pair
    lo_w, hi_w = dt_if_w[:-1], dt_if_w[1:]
    lo_s, hi_s = dt_if_s[:-1], dt_if_s[1:]

    if cfg.sw_triads:
        trx = 0.5 * (jnp.minimum(iso.drdx, 0.0) * (lo_w + hi)
                     + jnp.maximum(iso.drdx, 0.0) * (hi_w + lo))
        tre = 0.5 * (jnp.minimum(iso.drde, 0.0) * (lo_s + hi)
                     + jnp.maximum(iso.drde, 0.0) * (hi_s + lo))
    else:
        trx = 0.25 * iso.drdx * (lo_w + hi + hi_w + lo)
        tre = 0.25 * iso.drde * (lo_s + hi + hi_s + lo)
    fx = sign * iso.diff3u * 0.5 * (hz + shx(hz, -1)) * grid.dn_u[None] \
        * (dtdx - trx)
    fe = sign * iso.diff3v * 0.5 * (hz + she(hz, -1)) * grid.dm_v[None] \
        * (dtde - tre)

    # ---- vertical cross flux at interfaces kw = 1..N-1 --------------------
    # cell-side quantities below (kw-1) and above (kw) the interface
    dR_lo, dR_hi = iso.drdx[:-1], iso.drdx[1:]
    dR_lo_e, dR_hi_e = shx(dR_lo, 1), shx(dR_hi, 1)
    d3_lo, d3_hi = iso.diff3u[:-1], iso.diff3u[1:]
    d3_lo_e, d3_hi_e = shx(d3_lo, 1), shx(d3_hi, 1)
    dtdx_lo, dtdx_hi = dtdx[:-1], dtdx[1:]
    dtdx_lo_e, dtdx_hi_e = shx(dtdx_lo, 1), shx(dtdx_hi, 1)
    dz_if = dt_if[1:-1]                      # dTdz at interior interfaces

    tx1 = d3_lo * dR_lo * (dR_lo * dz_if - dtdx_lo)
    tx2 = d3_hi * dR_hi * (dR_hi * dz_if - dtdx_hi)
    tx3 = d3_hi_e * dR_hi_e * (dR_hi_e * dz_if - dtdx_hi_e)
    tx4 = d3_lo_e * dR_lo_e * (dR_lo_e * dz_if - dtdx_lo_e)

    dE_lo, dE_hi = iso.drde[:-1], iso.drde[1:]
    dE_lo_n, dE_hi_n = she(dE_lo, 1), she(dE_hi, 1)
    e3_lo, e3_hi = iso.diff3v[:-1], iso.diff3v[1:]
    e3_lo_n, e3_hi_n = she(e3_lo, 1), she(e3_hi, 1)
    dtde_lo, dtde_hi = dtde[:-1], dtde[1:]
    dtde_lo_n, dtde_hi_n = she(dtde_lo, 1), she(dtde_hi, 1)

    te1 = e3_lo * dE_lo * (dE_lo * dz_if - dtde_lo)
    te2 = e3_hi * dE_hi * (dE_hi * dz_if - dtde_hi)
    te3 = e3_hi_n * dE_hi_n * (dE_hi_n * dz_if - dtde_hi_n)
    te4 = e3_lo_n * dE_lo_n * (dE_lo_n * dz_if - dtde_lo_n)

    if cfg.sw_triads:
        cx = [dR_lo < 0.0, dR_hi > 0.0, dR_hi_e < 0.0, dR_lo_e > 0.0]
        ce = [dE_lo < 0.0, dE_hi > 0.0, dE_hi_n < 0.0, dE_lo_n > 0.0]
        sum_x = sum(jnp.where(c, t, 0.0)
                    for c, t in zip(cx, (tx1, tx2, tx3, tx4)))
        sum_e = sum(jnp.where(c, t, 0.0)
                    for c, t in zip(ce, (te1, te2, te3, te4)))
        idx = sum(c.astype(jnp.int32) for c in cx)
        ide = sum(c.astype(jnp.int32) for c in ce)
        wgt = jnp.asarray(SW_WGT, T.dtype)
        wx = wgt[idx]
        we = wgt[ide]
        fsc_in = fsc_m[1:-1] * (sum_x * wx + sum_e * we)
    else:
        fsc_in = fsc_m[1:-1] * 0.25 * (tx1 + tx2 + tx3 + tx4
                                       + te1 + te2 + te3 + te4)
    fsc_in = sign * fsc_in

    akz = None
    if t_stab is not None and cfg.stabilize:
        # implicit/explicit stabilization split
        # (reference: step3d_t_ISO.F:653-720 Akz + :809-811 explicit part)
        s2 = fsc_m[1:-1] ** 2
        s2_xll = s2 * dR_lo ** 2
        s2_xlu = s2 * dR_hi ** 2
        s2_xru = s2 * dR_hi_e ** 2
        s2_xrl = s2 * dR_lo_e ** 2
        s2_ell = s2 * dE_lo ** 2
        s2_elu = s2 * dE_hi ** 2
        s2_eru = s2 * dE_hi_n ** 2
        s2_erl = s2 * dE_lo_n ** 2
        cff = 2.0 / (hz[1:] + hz[:-1])
        cff2 = cff ** 2
        cffx = grid.pm[None] ** 2
        cffe = grid.pn[None] ** 2
        if cfg.sw_triads:
            m1 = jnp.maximum(jnp.maximum(d3_lo * s2_xll, d3_lo_e * s2_xrl),
                             jnp.maximum(d3_hi * s2_xlu, d3_hi_e * s2_xru))
            m2 = jnp.maximum(jnp.maximum(e3_lo * s2_ell, e3_lo_n * s2_erl),
                             jnp.maximum(e3_hi * s2_elu, e3_hi_n * s2_eru))
            m3 = jnp.maximum(
                jnp.maximum(d3_lo * (cffx + cff2 * s2_xll),
                            d3_hi * (cffx + cff2 * s2_xlu)),
                jnp.maximum(d3_hi_e * (cffx + cff2 * s2_xru),
                            d3_lo_e * (cffx + cff2 * s2_xrl)))
            m4 = jnp.maximum(
                jnp.maximum(e3_lo * (cffe + cff2 * s2_ell),
                            e3_hi * (cffe + cff2 * s2_elu)),
                jnp.maximum(e3_hi_n * (cffe + cff2 * s2_eru),
                            e3_lo_n * (cffe + cff2 * s2_erl)))
            akz = 15.0 * (m1 + m2) * (m3 + m4)
        else:
            a1 = (d3_lo * s2_xll + d3_lo_e * s2_xrl + d3_hi * s2_xlu
                  + d3_hi_e * s2_xru + e3_lo * s2_ell + e3_lo_n * s2_erl
                  + e3_hi * s2_elu + e3_hi_n * s2_eru)
            a2 = (d3_lo * (cffx + cff2 * s2_xll)
                  + d3_hi * (cffx + cff2 * s2_xlu)
                  + d3_hi_e * (cffx + cff2 * s2_xru)
                  + d3_lo_e * (cffx + cff2 * s2_xrl)
                  + e3_lo * (cffe + cff2 * s2_ell)
                  + e3_hi * (cffe + cff2 * s2_elu)
                  + e3_hi_n * (cffe + cff2 * s2_eru)
                  + e3_lo_n * (cffe + cff2 * s2_erl))
            akz = 0.5 * a1 * a2
        fsc_in = fsc_in - cff * akz * (t_stab[1:] - t_stab[:-1])

    zero = jnp.zeros_like(fsc_in[:1])
    fsc = jnp.concatenate([zero, fsc_in, zero], axis=0)
    return fx, fe, fsc, akz


def _lap_bc(lap, grid, cfg: ModelConfig):
    """Ghost values of the intermediate Laplacian
    (reference: step3d_t_ISO.F:521-570): 0 at walls, gradient at OBC."""
    from roms_tpu.parallel.halo import eset
    pe, pn = cfg.pad_e, cfg.pad_n
    if not cfg.ew_periodic:
        lap = eset(lap, (Ellipsis, slice(None), 1),
                   lap[..., :, 2] if cfg.obc_west else 0.0 * lap[..., :, 1],
                   grid.own_w)
        lap = eset(lap, (Ellipsis, slice(None), -2 - pe),
                   lap[..., :, -3 - pe] if cfg.obc_east
                   else 0.0 * lap[..., :, -2 - pe],
                   grid.own_e)
    if not cfg.ns_periodic:
        lap = eset(lap, (Ellipsis, 1, slice(None)),
                   lap[..., 2, :] if cfg.obc_south else 0.0 * lap[..., 1, :],
                   grid.own_s)
        lap = eset(lap, (Ellipsis, -2 - pn, slice(None)),
                   lap[..., -3 - pn, :] if cfg.obc_north
                   else 0.0 * lap[..., -2 - pn, :],
                   grid.own_n)
    return lap


def isoneutral_increment(t_nstp_k, iso: IsoFields, hz, z_r, grid,
                         cfg: ModelConfig, halo):
    """Hz-weighted increment of the rotated biharmonic for ONE tracer,
    to be ADDED (already times dt) to the tracer r.h.s., plus the Akz
    stabilization diffusivity (nz-1 interfaces) for the implicit solve
    (reference: step3d_t_ISO.F two-pass structure)."""
    pmn = (grid.pm * grid.pn)[None]
    fx, fe, fsc, _ = _rot_fluxes(t_nstp_k, iso, hz, z_r, grid, cfg,
                                 sign=1.0)
    lap = (pmn * (shift(fx, 0, 1) - fx + shift(fe, 1, 0) - fe)
           + fsc[1:] - fsc[:-1]) / hz
    lap = _lap_bc(lap, grid, cfg)
    lap = halo(lap)

    fx2, fe2, fsc2, akz = _rot_fluxes(lap, iso, hz, z_r, grid, cfg,
                                      sign=-1.0, t_stab=t_nstp_k)
    incr = cfg.dt * (pmn * (shift(fx2, 0, 1) - fx2
                            + shift(fe2, 1, 0) - fe2)
                     + fsc2[1:] - fsc2[:-1])
    return incr, akz
