"""Non-hydrostatic pressure projection (reference: NHMG/src/nhmg.f90:24-100
entry points, solver NHMG/src/mg_solvers.f90:17-149, seamount validation
NHMG/tests/mg_testseamount.f90).

The reference couples an external Fortran geometric-multigrid library with
per-level MPI halo exchanges.  The TPU-native equivalent here is a
PRECONDITIONED CONJUGATE GRADIENT on the cell-centred pressure Poisson
problem, with a vertical-line (tridiagonal) preconditioner:

  * the operator apply is one 7-point variable-coefficient stencil — three
    batched face-flux differences XLA tiles natively (no indirection, no
    per-level grids to materialize);
  * the preconditioner is one Thomas solve per column — the exact part of
    the operator along the direction that dominates it at ocean aspect
    ratios (dz << dx), which is what the reference's multigrid spends its
    strongest smoothing on;
  * dot products are plain reductions (psum under shard_map).

Discrete projection (MKS, volume-flux form): with face areas over
distances as coefficients,

    au = hz_u * dy_u * pm_u        (x-faces; masked at walls)
    av = hz_v * dx_v * pn_v        (y-faces)
    aw = dA / dz_w                 (z-faces; Dirichlet p=0 at the free
                                    surface via the half-cell distance,
                                    Neumann at the sea floor)

    L(p) = div( a * grad p ),   solve  L(p) = div(U*)
    u_corr = u - pm_u * dp,  v_corr = v - pn_v * dp,  w_corr = w - dp/dz

so the corrected volume-flux divergence equals the CG residual EXACTLY
(same discrete operators), and "solver converged" == "flow is
non-divergent".  Deviations from the reference (documented):

  1. the sigma-coordinate slope cross-terms of NHMG's full matrices
     (mg_define_matrices.f90) are dropped — the operator is the orthogonal
     approximation, adequate at the gentle slopes ROMS resolves and exact
     for level coordinates;
  2. w is not prognostic: the stepper passes a zero trial w and discards
     nh.w (the model's w stays diagnostic via omega/wvlcty), so the
     non-divergence guarantee covers (u, v, nh.w) — not (u, v) combined
     with the model's recomputed vertical velocity.  The projection is a
     horizontal-divergence damping valid in the weakly-non-hydrostatic
     regime; a faithful NHMG coupling needs a stepped w carried in state.

The reference ships NHMG disabled; this solver is likewise off by default
(cfg.non_hydrostatic).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from roms_tpu.config import ModelConfig


class NHResult(NamedTuple):
    p: jax.Array          # (nz, jy, ix) non-hydrostatic pressure potential
    u: jax.Array          # corrected velocities
    v: jax.Array
    w: jax.Array          # (nz+1, jy, ix) at w-points
    res0: jax.Array       # initial RHS norm
    res: jax.Array        # final residual norm


def _coefficients(hz, z_r, pm, pn, umask, vmask, cfg: ModelConfig):
    """Face coefficients of the Poisson operator, zeroed outside the
    interior and at land/wall faces."""
    jy, ix = pm.shape
    nz = hz.shape[0]
    dx = 1.0 / pm
    dy = 1.0 / pn
    # u faces: index i holds the face between cells i-1, i
    hz_u = 0.5 * (hz + jnp.roll(hz, 1, axis=-1))
    dy_u = 0.5 * (dy + jnp.roll(dy, 1, axis=-1))
    pm_u = 0.5 * (pm + jnp.roll(pm, 1, axis=-1))
    hz_v = 0.5 * (hz + jnp.roll(hz, 1, axis=-2))
    dx_v = 0.5 * (dx + jnp.roll(dx, 1, axis=-2))
    pn_v = 0.5 * (pn + jnp.roll(pn, 1, axis=-2))

    ii = jnp.arange(ix)[None, :]
    jj = jnp.arange(jy)[:, None]
    # interior cells are [2:-2]; active u faces 3..ix-3 (between interior
    # cells), walls (faces 2 and ix-2) carry zero flux
    face_u = ((ii >= 3) & (ii <= ix - 3) & (jj >= 2) & (jj <= jy - 3))
    face_v = ((jj >= 3) & (jj <= jy - 3) & (ii >= 2) & (ii <= ix - 3))
    mu = face_u * (umask if umask is not None else 1.0)
    mv = face_v * (vmask if vmask is not None else 1.0)

    au = hz_u * dy_u * pm_u * mu                 # (nz, jy, ix)
    av = hz_v * dx_v * pn_v * mv
    dA = dx * dy
    dz_w = z_r[1:] - z_r[:-1]                    # (nz-1, jy, ix)
    aw_int = dA[None] / dz_w                     # interior z faces 1..nz-1
    aw_top = dA / (0.5 * hz[-1])                 # Dirichlet p=0 at surface
    cell = ((ii >= 2) & (ii <= ix - 3) & (jj >= 2) & (jj <= jy - 3))
    return au, av, aw_int, aw_top, dA, cell.astype(hz.dtype)


def _apply(p, au, av, aw_int, aw_top, cell):
    """L(p) = div(a grad p); Neumann at the floor, Dirichlet 0 above the
    surface."""
    dpx = p - jnp.roll(p, 1, axis=-1)            # at u faces
    dpy = p - jnp.roll(p, 1, axis=-2)
    fx = au * dpx
    fy = av * dpy
    div = (jnp.roll(fx, -1, axis=-1) - fx
           + jnp.roll(fy, -1, axis=-2) - fy)
    fz = aw_int * (p[1:] - p[:-1])               # upward flux
    div = div.at[:-1].add(fz)
    div = div.at[1:].add(-fz)
    div = div.at[-1].add(-aw_top * p[-1])        # to the p=0 surface ghost
    return div * cell


def _line_precond(r, au, av, aw_int, aw_top, cell, eps=1e-30):
    """Vertical tridiagonal part of L (plus the full diagonal): one
    Thomas solve per column."""
    nz = r.shape[0]
    # diagonal: -(sum of all face coefficients at the cell)
    diag = -(au + jnp.roll(au, -1, axis=-1)
             + av + jnp.roll(av, -1, axis=-2))
    diag = diag.at[:-1].add(-aw_int)
    diag = diag.at[1:].add(-aw_int)
    diag = diag.at[-1].add(-aw_top)
    diag = jnp.where(cell > 0.0, diag, -1.0)
    lower = aw_int * cell                         # coupling k-1 <- k;
    # decoupled outside the active columns (their diag is -1, rhs 0)
    # forward elimination (Thomas)
    dprime = [None] * nz
    beta = diag[0]
    dprime[0] = r[0] / beta
    cs = [None] * (nz - 1)
    for k in range(nz - 1):
        cs[k] = lower[k] / beta
        beta = diag[k + 1] - lower[k] * cs[k]
        dprime[k + 1] = (r[k + 1] - lower[k] * dprime[k]) / beta
    x = [None] * nz
    x[nz - 1] = dprime[nz - 1]
    for k in range(nz - 2, -1, -1):
        x[k] = dprime[k] - cs[k] * x[k + 1]
    return jnp.stack(x) * cell


def nh_solve(u, v, w, hz, z_r, pm, pn, grid, cfg: ModelConfig,
             n_iter: int | None = None) -> NHResult:
    """Project (u, v, w) onto a discretely non-divergent field.

    u/v: (nz, jy, ix) at u/v points; w: (nz+1, jy, ix) at w points
    (w[0] = floor, w[nz] = surface).  Returns corrected fields + the
    residual norms (reference: nhmg_solve, NHMG/src/nhmg.f90)."""
    if n_iter is None:
        n_iter = cfg.nh_iters
    umask = getattr(grid, "umask", None) if cfg.masking else None
    vmask = getattr(grid, "vmask", None) if cfg.masking else None
    au, av, aw_int, aw_top, dA, cell = _coefficients(
        hz, z_r, pm, pn, umask, vmask, cfg)

    dy_u = 1.0 / (0.5 * (pm + jnp.roll(pm, 1, axis=-1)))
    dx_v = 1.0 / (0.5 * (pn + jnp.roll(pn, 1, axis=-2)))
    hz_u = 0.5 * (hz + jnp.roll(hz, 1, axis=-1))
    hz_v = 0.5 * (hz + jnp.roll(hz, 1, axis=-2))

    # volume-flux divergence of the trial field
    fu = u * hz_u * dy_u * (au > 0.0)
    fv = v * hz_v * dx_v * (av > 0.0)
    b = (jnp.roll(fu, -1, axis=-1) - fu
         + jnp.roll(fv, -1, axis=-2) - fv)
    fw = w[1:-1] * dA[None]
    b = b.at[:-1].add(fw)
    b = b.at[1:].add(-fw)
    b = b.at[-1].add(w[-1] * dA)                 # surface w flux
    b = b * cell

    # --- PCG on the NEGATED system (L is negative-definite; -L is SPD,
    # and -M likewise, so every PCG scalar is positive and the tiny-value
    # guards are sign-safe) ----------------------------------------------
    def dot(a_, b_):
        return jnp.sum(a_ * b_)

    def a_pos(x):
        return -_apply(x, au, av, aw_int, aw_top, cell)

    def m_pos(x):
        return -_line_precond(x, au, av, aw_int, aw_top, cell)

    bp = -b
    p0 = jnp.zeros_like(b)
    r = bp
    z = m_pos(r)
    d = z
    rz = dot(r, z)
    res0 = jnp.sqrt(dot(b, b))

    def body(carry, _):
        p, r, d, rz = carry
        ad = a_pos(d)
        alpha = rz / jnp.maximum(dot(d, ad), 1e-300)
        p = p + alpha * d
        r = r - alpha * ad
        z = m_pos(r)
        rz_new = dot(r, z)
        beta = rz_new / jnp.maximum(rz, 1e-300)
        d = z + beta * d
        return (p, r, d, rz_new), jnp.sqrt(dot(r, r))

    (p, r, _, _), res_hist = jax.lax.scan(body, (p0, r, d, rz),
                                          None, length=n_iter)

    # --- correction (same discrete gradients as the operator) ----------
    pm_u = 0.5 * (pm + jnp.roll(pm, 1, axis=-1))
    pn_v = 0.5 * (pn + jnp.roll(pn, 1, axis=-2))
    dpx = (p - jnp.roll(p, 1, axis=-1)) * pm_u
    dpy = (p - jnp.roll(p, 1, axis=-2)) * pn_v
    u_c = u - jnp.where(au > 0.0, dpx, 0.0)
    v_c = v - jnp.where(av > 0.0, dpy, 0.0)
    dz_w = z_r[1:] - z_r[:-1]
    w_c = w
    w_c = w_c.at[1:-1].add(-(p[1:] - p[:-1]) / dz_w)
    # surface: gradient to the p=0 ghost at half-cell distance; the sea
    # floor is Neumann (w[0] untouched)
    w_c = w_c.at[-1].set(w[-1] - (0.0 - p[-1]) / (0.5 * hz[-1]))
    return NHResult(p=p, u=u_c, v=v_c, w=w_c, res0=res0,
                    res=res_hist[-1])


def divergence(u, v, w, hz, pm, pn, cfg: ModelConfig, grid=None):
    """Volume-flux divergence diagnostic on the same discrete operators
    (for tests and the stepper's blowup watchdog)."""
    umask = getattr(grid, "umask", None) if (cfg.masking and grid is not None) else None
    vmask = getattr(grid, "vmask", None) if (cfg.masking and grid is not None) else None
    # reuse the coefficient masks to define active faces
    z_r_fake = jnp.cumsum(hz, axis=0) - 0.5 * hz     # only dz_w used
    au, av, _, _, dA, cell = _coefficients(hz, z_r_fake, pm, pn,
                                           umask, vmask, cfg)
    dy_u = 1.0 / (0.5 * (pm + jnp.roll(pm, 1, axis=-1)))
    dx_v = 1.0 / (0.5 * (pn + jnp.roll(pn, 1, axis=-2)))
    hz_u = 0.5 * (hz + jnp.roll(hz, 1, axis=-1))
    hz_v = 0.5 * (hz + jnp.roll(hz, 1, axis=-2))
    fu = u * hz_u * dy_u * (au > 0.0)
    fv = v * hz_v * dx_v * (av > 0.0)
    b = (jnp.roll(fu, -1, axis=-1) - fu
         + jnp.roll(fv, -1, axis=-2) - fv)
    fw = w[1:-1] * dA[None]
    b = b.at[:-1].add(fw)
    b = b.at[1:].add(-fw)
    b = b.at[-1].add(w[-1] * dA)
    return b * cell
