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
non-divergent".

SIGMA-SLOPE CROSS-TERMS (cfg.nh_sigma_terms, default on): the reference's
full matrices (NHMG/src/mg_define_matrices.f90) carry the terrain-
following metric terms — the TRUE horizontal gradient on a tilted sigma
surface is dp/dx|_z = dp/dx|_s - z_x dp/dz, and the flux through a
tilted sigma cell face mixes w with u, v.  Here the full operator is
built VARIATIONALLY: a linear discrete z-gradient G (horizontal
differences minus the slope times the averaged vertical derivative),
face-area weights A, and the EXACT adjoint G^T from
jax.linear_transpose — so L = G^T A G is symmetric positive
semi-definite by construction (the property mg_define_matrices
hand-assembles), the normal equations G^T A G p = G^T A U* are the
discrete projection, and U - G p has zero tilted-face divergence.
With nh_sigma_terms=False the operator reduces bit-for-bit to the
orthogonal 7-point approximation (exact for level coordinates).

Remaining deviation (documented): w is not prognostic — the stepper
passes a zero trial w and discards nh.w (the model's w stays diagnostic
via omega/wvlcty), so the non-divergence guarantee covers (u, v, nh.w),
not (u, v) with the model's recomputed vertical velocity.  The
projection is a horizontal-divergence damping valid in the weakly-
non-hydrostatic regime; a faithful NHMG coupling needs a stepped w
carried in state.

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


class _Geometry(NamedTuple):
    au: jax.Array         # hz_u*dy_u*pm_u * face mask  (orthogonal coeff)
    av: jax.Array
    aw_int: jax.Array
    aw_top: jax.Array
    dA: jax.Array
    cell: jax.Array
    area_u: jax.Array     # hz_u*dy_u * face mask (area only)
    area_v: jax.Array
    pm_u: jax.Array
    pn_v: jax.Array
    zx_u: jax.Array       # sigma-surface slope at u faces (per level)
    zy_v: jax.Array
    dz_w: jax.Array
    hz_top: jax.Array
    sigma: bool


def _geometry(hz, z_r, pm, pn, umask, vmask, cfg: ModelConfig) -> _Geometry:
    au, av, aw_int, aw_top, dA, cell = _coefficients(
        hz, z_r, pm, pn, umask, vmask, cfg)
    pm_u = 0.5 * (pm + jnp.roll(pm, 1, axis=-1))
    pn_v = 0.5 * (pn + jnp.roll(pn, 1, axis=-2))
    mu = (au > 0.0).astype(hz.dtype)
    mv = (av > 0.0).astype(hz.dtype)
    area_u = au / jnp.maximum(pm_u, 1e-300) * mu
    area_v = av / jnp.maximum(pn_v, 1e-300) * mv
    # sigma-surface slope at the faces, per level (reference: the zx/zy
    # metric arrays of mg_define_matrices.f90)
    zx_u = (z_r - jnp.roll(z_r, 1, axis=-1)) * pm_u[None] * mu
    zy_v = (z_r - jnp.roll(z_r, 1, axis=-2)) * pn_v[None] * mv
    return _Geometry(au=au, av=av, aw_int=aw_int, aw_top=aw_top, dA=dA,
                     cell=cell, area_u=area_u, area_v=area_v,
                     pm_u=pm_u, pn_v=pn_v, zx_u=zx_u, zy_v=zy_v,
                     dz_w=z_r[1:] - z_r[:-1], hz_top=hz[-1],
                     sigma=bool(cfg.nh_sigma_terms))


def _gradient(p, geo):
    """Discrete z-coordinate gradient of the cell pressure at the three
    face families: gx (u faces), gy (v faces), gz (w faces 0..nz; floor
    Neumann 0, surface Dirichlet p=0 at half-cell distance)."""
    gz_int = (p[1:] - p[:-1]) / geo.dz_w
    gz_top = (0.0 - p[-1]) / (0.5 * geo.hz_top)
    gz = jnp.concatenate([jnp.zeros_like(p[:1]), gz_int, gz_top[None]],
                         axis=0)
    dpx = (p - jnp.roll(p, 1, axis=-1)) * geo.pm_u[None]
    dpy = (p - jnp.roll(p, 1, axis=-2)) * geo.pn_v[None]
    if geo.sigma:
        gz_c = 0.5 * (gz[1:] + gz[:-1])                     # cell centers
        gz_u = 0.5 * (gz_c + jnp.roll(gz_c, 1, axis=-1))    # u faces
        gz_v = 0.5 * (gz_c + jnp.roll(gz_c, 1, axis=-2))
        gx = dpx - geo.zx_u * gz_u
        gy = dpy - geo.zy_v * gz_v
    else:
        gx, gy = dpx, dpy
    mu = (geo.au > 0.0)
    mv = (geo.av > 0.0)
    return gx * mu, gy * mv, gz * geo.cell[None]


def _aw_faces(geo):
    """w-face areas 0..nz (floor face zero: Neumann)."""
    nz = geo.dz_w.shape[0] + 1
    flat = jnp.broadcast_to(geo.dA, (nz - 1,) + geo.dA.shape)
    return jnp.concatenate(
        [jnp.zeros_like(geo.dA)[None], flat, geo.dA[None]],
        axis=0) * geo.cell[None]


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
    geo = _geometry(hz, z_r, pm, pn, umask, vmask, cfg)
    au, av, aw_int, aw_top, cell = (geo.au, geo.av, geo.aw_int,
                                    geo.aw_top, geo.cell)
    aw_f = _aw_faces(geo)

    grad_fn = lambda q: _gradient(q, geo)
    gt_fn = jax.linear_transpose(grad_fn, jnp.zeros_like(hz))

    def div_t(fx, fy, fz):
        """G^T of area-weighted face fields: the (negated) tilted-face
        divergence — the exact adjoint of the gradient."""
        (out,) = gt_fn((fx, fy, fz))
        return out * cell

    # RHS of the normal equations  G^T A G p = G^T A U*
    w_f = w.at[0].set(0.0)                      # no flux through the floor
    bp = div_t(geo.area_u * u * (au > 0.0),
               geo.area_v * v * (av > 0.0), aw_f * w_f)

    def dot(a_, b_):
        return jnp.sum(a_ * b_)

    def a_pos(x):
        gx, gy, gz = grad_fn(x)
        return div_t(geo.area_u * gx, geo.area_v * gy, aw_f * gz)

    def m_pos(x):
        return -_line_precond(x, au, av, aw_int, aw_top, cell)

    p0 = jnp.zeros_like(bp)
    r = bp
    z = m_pos(r)
    d = z
    rz = dot(r, z)
    res0 = jnp.sqrt(dot(bp, bp))

    # freeze the recurrence once converged: continuing CG past the
    # round-off floor re-amplifies noise (alpha = tiny/tiny garbage
    # directions) — observed on the seamount geometry in both operators
    rtol = 1e-13
    done0 = jnp.asarray(False)

    def body(carry, _):
        p, r, d, rz, done = carry
        ad = a_pos(d)
        alpha = rz / jnp.maximum(dot(d, ad), 1e-300)
        p_n = p + alpha * d
        r_n = r - alpha * ad
        z = m_pos(r_n)
        rz_new = dot(r_n, z)
        beta = rz_new / jnp.maximum(rz, 1e-300)
        d_n = z + beta * d
        p = jnp.where(done, p, p_n)
        r = jnp.where(done, r, r_n)
        d = jnp.where(done, d, d_n)
        rz = jnp.where(done, rz, rz_new)
        res = jnp.sqrt(dot(r, r))
        done = done | (res <= rtol * res0)
        return (p, r, d, rz, done), res

    (p, r, _, _, _), res_hist = jax.lax.scan(
        body, (p0, r, d, rz, done0), None, length=n_iter)

    # --- correction: U - G p (the SAME discrete gradient) ---------------
    gx, gy, gz = grad_fn(p)
    u_c = u - gx
    v_c = v - gy
    w_c = w - gz.at[0].set(0.0)
    return NHResult(p=p, u=u_c, v=v_c, w=w_c, res0=res0,
                    res=res_hist[-1])


def divergence(u, v, w, hz, pm, pn, cfg: ModelConfig, grid=None,
               z_r=None):
    """Tilted-face volume-flux divergence diagnostic on the same discrete
    operators the projection uses (for tests and the stepper's blowup
    watchdog).  With cfg.nh_sigma_terms=False this is the orthogonal
    divergence of the round-4 solver."""
    umask = getattr(grid, "umask", None) \
        if (cfg.masking and grid is not None) else None
    vmask = getattr(grid, "vmask", None) \
        if (cfg.masking and grid is not None) else None
    if z_r is None:
        z_r = jnp.cumsum(hz, axis=0) - 0.5 * hz
    geo = _geometry(hz, z_r, pm, pn, umask, vmask, cfg)
    gt_fn = jax.linear_transpose(lambda q: _gradient(q, geo),
                                 jnp.zeros_like(hz))
    aw_f = _aw_faces(geo)
    w_f = w.at[0].set(0.0)
    (out,) = gt_fn((geo.area_u * u * (geo.au > 0.0),
                    geo.area_v * v * (geo.av > 0.0), aw_f * w_f))
    return out * geo.cell
