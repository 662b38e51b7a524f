"""Lateral physical boundary conditions (closed-wall variants).

Closed boundaries of the reference BC kernels: no normal flow, free/no-slip
tangential ghosts (gamma2), zero-gradient tracer/free-surface ghosts, and
corner averaging (reference: src/zetabc.F, src/u2dbc_im.F, src/v2dbc_im.F,
src/u3dbc_im.F, src/v3dbc_im.F, src/t3dbc_im.F — the non-OBC branches).
Open-boundary (Flather / Orlanski / specified) variants plug in here.

Padded-index map (halo=2): Fortran i → python i+1; so the wall-adjacent
interior is index 2 / -3, the physical ghost ring is index 1 / -2.

Single-block only for now: under a device mesh, physical-edge application
needs per-shard edge ownership masks (round-2 work).
"""

from __future__ import annotations

import jax.numpy as jnp

from roms_tpu.config import ModelConfig


def zetabc(zeta_new, grid, cfg: ModelConfig):
    """Free-surface ghost update (closed: zero-gradient, masked;
    reference: zetabc.F:53-60 etc.; corners :177-196)."""
    if cfg.fully_periodic:
        return zeta_new
    z = zeta_new
    m = grid.rmask if cfg.masking else None
    if not cfg.ew_periodic:
        z = z.at[..., :, 1].set(z[..., :, 2] * (m[..., :, 1] if m is not None else 1.0))
        z = z.at[..., :, -2].set(z[..., :, -3] * (m[..., :, -2] if m is not None else 1.0))
    if not cfg.ns_periodic:
        z = z.at[..., 1, :].set(z[..., 2, :] * (m[..., 1, :] if m is not None else 1.0))
        z = z.at[..., -2, :].set(z[..., -3, :] * (m[..., -2, :] if m is not None else 1.0))
    if not cfg.ew_periodic and not cfg.ns_periodic:
        z = z.at[..., 1, 1].set(0.5 * (z[..., 1, 2] + z[..., 2, 1]))
        z = z.at[..., 1, -2].set(0.5 * (z[..., 1, -3] + z[..., 2, -2]))
        z = z.at[..., -2, 1].set(0.5 * (z[..., -2, 2] + z[..., -3, 1]))
        z = z.at[..., -2, -2].set(0.5 * (z[..., -2, -3] + z[..., -3, -2]))
    return z


def _gamma2(cfg):
    return getattr(cfg, "gamma2", 1.0)


def u_momentum_bc(u, grid, cfg: ModelConfig):
    """Closed-wall BC for a u-type field (2D ubar or 3D u):
    zero normal flow at W/E walls, gamma2 tangential ghost at S/N walls
    (reference: u3dbc_im.F:127-131, :216-221, :290-300;
    u2dbc_im.F:150-153, :357-363)."""
    if cfg.fully_periodic:
        return u
    g2 = _gamma2(cfg)
    um = grid.umask
    if not cfg.ew_periodic:
        u = u.at[..., :, 2].set(0.0)     # western wall u(istr)=0
        u = u.at[..., :, -2].set(0.0)    # eastern wall u(iend+1)=0
    if not cfg.ns_periodic:
        u = u.at[..., 1, :].set(g2 * u[..., 2, :] * (um[1, :] if cfg.masking else 1.0))
        u = u.at[..., -2, :].set(g2 * u[..., -3, :] * (um[-2, :] if cfg.masking else 1.0))
    return u


def v_momentum_bc(v, grid, cfg: ModelConfig):
    """Mirror of u_momentum_bc for v-type fields."""
    if cfg.fully_periodic:
        return v
    g2 = _gamma2(cfg)
    vm = grid.vmask
    if not cfg.ns_periodic:
        v = v.at[..., 2, :].set(0.0)     # southern wall v(jstr)=0
        v = v.at[..., -2, :].set(0.0)    # northern wall v(jend+1)=0
    if not cfg.ew_periodic:
        v = v.at[..., :, 1].set(g2 * v[..., :, 2] * (vm[:, 1] if cfg.masking else 1.0))
        v = v.at[..., :, -2].set(g2 * v[..., :, -3] * (vm[:, -2] if cfg.masking else 1.0))
    return v


def t3dbc(t, grid, cfg: ModelConfig):
    """Tracer ghost update (closed: zero-gradient, masked; corner points
    masked-averaged; reference: t3dbc_im.F:85-96, :420-470).
    t: (..., nz, jy, ix) or (nz, jy, ix)."""
    if cfg.fully_periodic:
        return t
    m = grid.rmask if cfg.masking else jnp.ones_like(grid.h)
    if not cfg.ew_periodic:
        t = t.at[..., :, 1].set(t[..., :, 2] * m[:, 1])
        t = t.at[..., :, -2].set(t[..., :, -3] * m[:, -2])
    if not cfg.ns_periodic:
        t = t.at[..., 1, :].set(t[..., 2, :] * m[1, :])
        t = t.at[..., -2, :].set(t[..., -3, :] * m[-2, :])
    if not cfg.ew_periodic and not cfg.ns_periodic:
        def corner(t, jc, ic, ja, ia, jb, ib):
            cff = m[ja, ia] + m[jb, ib]
            avg = jnp.where(cff > 0.0,
                            (m[ja, ia] * t[..., ja, ia]
                             + m[jb, ib] * t[..., jb, ib]) / jnp.maximum(cff, 1.0),
                            t[..., jc, ic])
            return t.at[..., jc, ic].set(avg)

        # SW: t(istr-1,jstr-1) from t(istr,jstr-1) & t(istr-1,jstr)
        t = corner(t, 1, 1, 1, 2, 2, 1)
        t = corner(t, 1, -2, 1, -3, 2, -2)
        t = corner(t, -2, 1, -2, 2, -3, 1)
        t = corner(t, -2, -2, -2, -3, -3, -2)
    return t
