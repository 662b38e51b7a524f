"""Implicit vertical solvers and bottom drag.

Batched Thomas (Gaussian-elimination) solves for vertical diffusion with the
implicit part of vertical advection folded in, exactly as in the reference:
tracers (reference: src/pre_step3d4S.F:216-263, src/step3d_t_ISO.F:1007-1100)
and momentum (reference: src/pre_step3d4S.F:362-488,
src/step3d_uv1.F:138-297 IMPLICIT_BOTTOM_DRAG branch), plus the
finite-volume log-layer bottom drag (reference: src/compute_rd_bott_drag.h).

Each recurrence runs as a `lax.scan` over the (small) vertical dimension
carrying full horizontal planes — every scan step is one fused VPU sweep
over the (j, i) tile.

Index conventions (0-based): cells c = 0..nz-1, W-interfaces m = 0..nz.
Interface coefficient arrays fcv/wcv have length nz-1 with entry j standing
for interface j+1 (interfaces 0 and nz carry no diffusive flux).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from roms_tpu.config import ModelConfig
from roms_tpu.parallel.halo import shift


def bottom_drag(u, v, hz, cfg: ModelConfig):
    """Dynamic bottom drag coefficient rd at rho points
    (reference: src/compute_rd_bott_drag.h:1-64; log-layer finite-volume law)."""
    ub = u[0]
    vb = v[0]
    if cfg.zob > 0.0:
        cff = jnp.sqrt((1.0 / 3.0) * (
            ub ** 2 + shift(ub, 0, 1) ** 2 + ub * shift(ub, 0, 1)
            + vb ** 2 + shift(vb, 1, 0) ** 2 + vb * shift(vb, 1, 0)))
        return cff * (cfg.von_karman
                      / jnp.log(1.0 + 0.5 * hz[0] / cfg.zob)) ** 2
    rd = jnp.full_like(ub, cfg.rdrg)
    return jnp.minimum(rd, 0.8 * hz[0] / cfg.dt)


def tracer_implicit(t_rhs, hz_col, akt, wi, pmn, dtau, rmask, cfg: ModelConfig,
                    apply_mask: bool):
    """Implicit vertical diffusion + implicit vertical advection for one
    tracer.  t_rhs: (nz,..) Hz-weighted tracer content; hz_col: grid-box
    heights (Hz_fwd in the predictor, Hz in the corrector); akt: (nz+1,..)
    diffusivity at W-points; wi: (nz+1,..) implicit vertical flux;
    pmn = pm*pn.  Returns the new tracer concentration.
    (reference: pre_step3d4S.F:216-263 / step3d_t_ISO.F:1044-1100.)
    """
    nz = t_rhs.shape[0]
    dc0 = dtau * pmn
    fcv = 2.0 * dtau * akt[1:nz] / (hz_col[1:] + hz_col[:-1])
    wcv = dc0[None] * wi[1:nz]
    wc_p = jnp.maximum(wcv, 0.0)
    wc_m = jnp.minimum(wcv, 0.0)

    # forward (bottom-up) elimination over cells c = 0..nz-2
    def fwd(carry, c):
        cf_prev, dc_prev = carry
        below = jnp.where(c > 0,
                          fcv[c - 1] - wc_m[c - 1]
                          - cf_prev * (fcv[c - 1] + wc_p[c - 1]), 0.0)
        rhs_extra = jnp.where(c > 0, dc_prev * (fcv[c - 1] + wc_p[c - 1]), 0.0)
        cff = 1.0 / (hz_col[c] + fcv[c] + wc_p[c] + below)
        cf_c = cff * (fcv[c] - wc_m[c])
        dc_c = cff * (t_rhs[c] + rhs_extra)
        return (cf_c, dc_c), (cf_c, dc_c)

    zero = jnp.zeros_like(t_rhs[0])
    (_, _), (cf_seq, dc_seq) = lax.scan(fwd, (zero, zero), jnp.arange(nz - 1))

    t_top = ((t_rhs[nz - 1] + dc_seq[nz - 2] * (fcv[nz - 2] + wc_p[nz - 2]))
             / (hz_col[nz - 1] + fcv[nz - 2] - wc_m[nz - 2]
                - cf_seq[nz - 2] * (fcv[nz - 2] + wc_p[nz - 2])))
    if apply_mask and cfg.masking:
        t_top = t_top * rmask

    def bwd(t_above, c):
        t_c = dc_seq[c] + cf_seq[c] * t_above
        if apply_mask and cfg.masking:
            t_c = t_c * rmask
        return t_c, t_c

    _, t_rev = lax.scan(bwd, t_top, jnp.arange(nz - 2, -1, -1))
    return jnp.concatenate([t_rev[::-1], t_top[None]], axis=0)


def tracer_implicit_all(t_rhs, hz_col, akt_b, wi, pmn, dtau, rmask,
                        cfg: ModelConfig, apply_mask: bool):
    """Batched `tracer_implicit` over the leading tracer axis.

    t_rhs: (nt, nz, ..) Hz-weighted tracer content; akt_b: (nt, nz+1, ..)
    per-tracer diffusivity (already gathered/augmented by the caller).
    One vmapped scan over nz replaces the reference's per-tracer loop
    (reference: step3d_t_ISO.F itrc loop) — the HLO stays flat in nt.
    """
    import jax

    def one(tr, ak):
        return tracer_implicit(tr, hz_col, ak, wi, pmn, dtau, rmask, cfg,
                               apply_mask)

    return jax.vmap(one, in_axes=(0, 0))(t_rhs, akt_b)


def gather_akt(akt, cfg: ModelConfig):
    """Per-tracer diffusivity table (nt, nz+1, ..): tracer i uses
    akt[min(i, iTandS-1)] (reference: src/tracers.F iTandS clamp)."""
    idx = jnp.asarray([min(i, cfg.i_t_and_s - 1) for i in range(cfg.nt)])
    return akt[idx]


def momentum_implicit(rhs, hz_face, akv_face, wi_face, dc0, dtau, sstr,
                      cfg: ModelConfig, bottom_drag_coeff=None):
    """Implicit vertical viscosity + implicit vertical advection solve for
    one horizontal momentum component at its staggered points.

    rhs:        (nz,..) Hz-weighted momentum content (incl. any dc0*ru term)
    hz_face:    (nz,..) 0.5*(Hz + Hz_shifted) grid-box heights
    akv_face:   (nz+1,..) 0.5*(Akv + Akv_shifted) at staggered W-levels
    wi_face:    (nz+1,..) 0.5*(Wi + Wi_shifted)
    dc0:        dtau*0.25*(pm+pm_m)*(pn+pn_m)
    sstr:       surface stress, added as dtau*sstr to the top-cell RHS
    bottom_drag_coeff: 0.5*(rd + rd_shifted); adds dtau*coeff to the bottom
                diagonal (IMPLCT_NO_SLIP_BTTM_BC,
                reference: set_global_definitions.h:73)

    Returns the solved velocity [m/s] per cell.
    (reference: pre_step3d4S.F:377-424 / step3d_uv1.F:146-206.)
    """
    nz = rhs.shape[0]
    # FC at interface j+1 = 2*dtau*(Akv_k + Akv_k,shift) / (4-point Hz sum)
    #                     = 2*dtau*akv_face[j+1] / (hzf[j+1] + hzf[j])
    fcv = 2.0 * dtau * akv_face[1:nz] / (hz_face[1:] + hz_face[:-1])
    wcv = dc0[None] * wi_face[1:nz]
    wc_p = jnp.maximum(wcv, 0.0)
    wc_m = jnp.minimum(wcv, 0.0)

    top_rhs = rhs[nz - 1] + dtau * sstr

    # top cell (c = nz-1): produces CF at interface nz-1 and DC[nz-1]
    cff_top = 1.0 / (hz_face[nz - 1] + fcv[nz - 2] - wc_m[nz - 2])
    cf_top = cff_top * (fcv[nz - 2] + wc_p[nz - 2])
    dc_top = cff_top * top_rhs

    # downward elimination, cells c = nz-2..1; carry (CF at iface c+1, DC[c+1])
    def dwn(carry, c):
        cf_up, dc_up = carry
        cff = 1.0 / (hz_face[c]
                     + fcv[c - 1] - wc_m[c - 1]
                     + fcv[c] + wc_p[c]
                     - cf_up * (fcv[c] - wc_m[c]))
        cf_c = cff * (fcv[c - 1] + wc_p[c - 1])
        dc_c = cff * (rhs[c] + dc_up * (fcv[c] - wc_m[c]))
        return (cf_c, dc_c), (cf_c, dc_c)

    (_, _), (cf_seq, dc_seq) = lax.scan(
        dwn, (cf_top, dc_top), jnp.arange(nz - 2, 0, -1))
    # cf_seq/dc_seq are ordered c = nz-2..1; ascending views:
    cf_asc = cf_seq[::-1]   # CF at interface c for c = 1..nz-2
    dc_asc = dc_seq[::-1]   # DC[c] for c = 1..nz-2

    cf_ifc1 = cf_asc[0]     # CF at interface 1
    dc_cell1 = dc_asc[0]    # DC at cell 1

    denom = (hz_face[0] + fcv[0] + wc_p[0] - cf_ifc1 * (fcv[0] - wc_m[0]))
    if bottom_drag_coeff is not None:
        denom = denom + dtau * bottom_drag_coeff
    dc_bot = (rhs[0] + dc_cell1 * (fcv[0] - wc_m[0])) / denom

    # upward back substitution: DC[c] += CF(iface c) * DC[c-1], c = 1..nz-1
    dc_all = jnp.concatenate([dc_asc, dc_top[None]], axis=0)  # cells 1..nz-1
    cf_all = jnp.concatenate([cf_asc, cf_top[None]], axis=0)  # ifaces 1..nz-1

    def up(dc_below, c):
        dc_c = dc_all[c] + cf_all[c] * dc_below
        return dc_c, dc_c

    _, dc_up_seq = lax.scan(up, dc_bot, jnp.arange(nz - 1))
    return jnp.concatenate([dc_bot[None], dc_up_seq], axis=0)
