"""Density-Jacobian pressure gradient (reference: src/prsgrd.F).

Non-conservative density-Jacobian scheme with cubic polynomial fits and
harmonic-averaged elementary differences (Shchepetkin & McWilliams 2003).
Supports the plain-rho path and the SPLIT_EOS adiabatic-difference path
(reference: prsgrd.F:88-119).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from roms_tpu.config import ModelConfig
from roms_tpu.ops.eos import QP2
from roms_tpu.parallel.halo import shift

ONE_FIFTH = 0.2
ONE_TWELFTH = 1.0 / 12.0


def _harmonic(a, b, guard: bool):
    """2ab/(a+b) where (guard: 2ab>0) else 0 (reference: prsgrd.F:186-195)."""
    cff = 2.0 * a * b
    if guard:
        return jnp.where(cff > 0.0, cff / (a + b), 0.0)
    return cff / (a + b)


def prsgrd(rho, rho1, qp1, z_r, z_w, hz, grid, cfg: ModelConfig, ptide=None):
    """Return (ru, rv): finite-volume pressure-gradient r.h.s. [m^4/s^2].

    rho: in-situ density anomaly (nz, ..).  With SPLIT_EOS (cfg.nonlin_eos),
    rho1/qp1 supply adiabatic differences; rho is the reconstructed in-situ
    field (reference: prsgrd.F:196-201 recomputes it; we take it from
    rho_eos which used the identical formula).
    """
    nz = cfg.nz
    grho = cfg.g / cfg.rho0
    half_grho = 0.5 * grho
    split = cfg.nonlin_eos

    # ---- vertical elementary differences at W-points (reference: :160-183)
    dz_el = z_r[1:] - z_r[:-1]                      # (nz-1,..) k=1..N-1
    if split:
        dpth_w = -0.5 * (z_r[1:] + z_r[:-1])
        dr_el = (rho1[1:] - rho1[:-1]
                 + (qp1[1:] - qp1[:-1]) * dpth_w * (1.0 - QP2 * dpth_w))
    else:
        dr_el = rho[1:] - rho[:-1]
    # extend top & bottom: dR[N]=dR[N-1], dR[0]=dR[1]
    dz_ext = jnp.concatenate([dz_el[:1], dz_el, dz_el[-1:]], axis=0)  # k=0..N
    dr_ext = jnp.concatenate([dr_el[:1], dr_el, dr_el[-1:]], axis=0)
    # harmonic average onto RHO-points: dZ[k] = harm(dz_ext[k], dz_ext[k-1])
    dZ = _harmonic(dz_ext[1:], dz_ext[:-1], guard=False)   # (nz,..) k=1..N
    dR = _harmonic(dr_ext[1:], dr_ext[:-1], guard=True)
    if split:
        dpth_r = -z_r
        dR = dR - qp1 * dZ * (1.0 - 2.0 * QP2 * dpth_r)

    # ---- hydrostatic pressure integral (reference: :205-225) -------------
    p_top = cfg.g * z_w[nz] + grho * (
        rho[nz - 1] + 0.5 * (rho[nz - 1] - rho[nz - 2])
        * (z_w[nz] - z_r[nz - 1]) / (z_r[nz - 1] - z_r[nz - 2])
    ) * (z_w[nz] - z_r[nz - 1])
    if ptide is not None:
        p_top = p_top - cfg.g * ptide

    def p_incr(k):  # increment from level k+1 down to k (0-based k)
        return half_grho * (
            (rho[k + 1] + rho[k]) * (z_r[k + 1] - z_r[k])
            - ONE_FIFTH * (
                (dR[k + 1] - dR[k]) * (z_r[k + 1] - z_r[k]
                                       - ONE_TWELFTH * (dZ[k + 1] + dZ[k]))
                - (dZ[k + 1] - dZ[k]) * (rho[k + 1] - rho[k]
                                         - ONE_TWELFTH * (dR[k + 1] + dR[k]))))

    incr = jax.vmap(p_incr)(jnp.arange(nz - 1))     # (nz-1,..)
    # P[k] = P_top + sum of increments from above (sequential downward)
    p_below = p_top[None] + lax.associative_scan(
        jnp.add, incr[::-1], axis=0)[::-1]
    P = jnp.concatenate([p_below, p_top[None]], axis=0)  # (nz,..)

    # ---- XI component (reference: :231-305) ------------------------------
    def horiz_component(ax):
        """ax=1: XI (i-direction, u-points); ax=0: ETA (j, v-points)."""
        if ax == 1:
            sh = lambda a, d: shift(a, 0, d)
            mask = grid.umask[None]
            dn = grid.dn_u[None]
            hz_face = 0.5 * (hz + shift(hz, 0, -1))
        else:
            sh = lambda a, d: shift(a, d, 0)
            mask = grid.vmask[None]
            dn = grid.dm_v[None]
            hz_face = 0.5 * (hz + shift(hz, -1, 0))

        FC = (z_r - sh(z_r, -1))
        if cfg.masking:
            FC = FC * mask
        if split:
            dpth = -0.5 * (z_r + sh(z_r, -1))
            rx = (rho1 - sh(rho1, -1)
                  + (qp1 - sh(qp1, -1)) * dpth * (1.0 - QP2 * dpth))
        else:
            rx = rho - sh(rho, -1)
        if cfg.masking:
            rx = rx * mask

        # extrapolate elementary differences near physical boundaries
        # (reference: prsgrd.F:256-269, :369-382)
        from roms_tpu.parallel.halo import eset
        pe, pn = cfg.pad_e, cfg.pad_n
        if ax == 1 and not cfg.ew_periodic:
            FC = eset(FC, (Ellipsis, slice(None), 2), FC[..., :, 3],
                      grid.own_w)
            FC = eset(FC, (Ellipsis, slice(None), -2 - pe),
                      FC[..., :, -3 - pe], grid.own_e)
            rx = eset(rx, (Ellipsis, slice(None), 2), rx[..., :, 3],
                      grid.own_w)
            rx = eset(rx, (Ellipsis, slice(None), -2 - pe),
                      rx[..., :, -3 - pe], grid.own_e)
        if ax == 0 and not cfg.ns_periodic:
            FC = eset(FC, (Ellipsis, 2, slice(None)), FC[..., 3, :],
                      grid.own_s)
            FC = eset(FC, (Ellipsis, -2 - pn, slice(None)),
                      FC[..., -3 - pn, :], grid.own_n)
            rx = eset(rx, (Ellipsis, 2, slice(None)), rx[..., 3, :],
                      grid.own_s)
            rx = eset(rx, (Ellipsis, -2 - pn, slice(None)),
                      rx[..., -3 - pn, :], grid.own_n)

        # horizontal harmonic averages are both zero-guarded
        # (reference: prsgrd.F:271-290, epsil=0)
        dZx = _harmonic(FC, sh(FC, 1), guard=True)
        dRx = _harmonic(rx, sh(rx, 1), guard=True)
        if split:
            dRx = dRx - qp1 * dZx * (1.0 + 2.0 * QP2 * z_r)

        r = hz_face * dn * (
            sh(P, -1) - P - half_grho * (
                (rho + sh(rho, -1)) * (z_r - sh(z_r, -1))
                - ONE_FIFTH * (
                    (dRx - sh(dRx, -1)) * (z_r - sh(z_r, -1)
                                           - ONE_TWELFTH * (dZx + sh(dZx, -1)))
                    - (dZx - sh(dZx, -1)) * (rho - sh(rho, -1)
                                             - ONE_TWELFTH * (dRx + sh(dRx, -1))))))
        return r

    ru = horiz_component(1)
    rv = horiz_component(0)
    return ru, rv
