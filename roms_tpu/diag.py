"""Global diagnostics: volume-averaged energies and maximum Courant numbers
(reference: src/diag.F).

The reference guarantees rank-count-independent results with pairwise tree
summation in double precision (reference: diag.F:14 SUM_BY_PAIRS,
:434-470 manual MPI tree; QUAD==8, set_global_definitions.h:375-382).
Here the sums are float64 XLA reductions — deterministic for a fixed
device count — and under a device mesh become `psum` of per-shard partials.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from roms_tpu.config import ModelConfig
from roms_tpu.grid import Grid
from roms_tpu.parallel.halo import shift
from roms_tpu.state import OceanState


class Diag(NamedTuple):
    avke: jax.Array      # volume-mean kinetic energy (KINETIC_ENRG)
    avke2b: jax.Array    # barotropic KE (BAROTR_KE)
    avpe: jax.Array      # potential energy
    avzeta: jax.Array    # area-mean free surface
    cu_adv: jax.Array    # max advective Courant number (MAX_ADV_CFL)
    cu_w: jax.Array      # vertical contribution (MAX_VERT_CFL)
    v2d_max: jax.Array


def _interior(a, h):
    return a[..., h:-h, h:-h]


def compute_diag(state: OceanState, grid: Grid, cfg: ModelConfig) -> Diag:
    """Diagnostics of the just-completed step.

    Uses the time-n velocity (state.u_prev — the reference's diag reads
    index nstp which still points at the pre-step level,
    reference: main.F:374-378 vs diag call at :490), the new Hz/z_w, the
    corrected n+1/2 fluxes, and the new density (reference: diag.F:129-237).
    """
    h = cfg.halo
    u = state.u_prev
    v = state.v_prev
    hz = state.hz
    z_w = state.z_w

    # barotropic (vertical mean) velocities at u/v points (diag.F:129-146)
    hzu = hz + shift(hz, 0, -1)
    hzv = hz + shift(hz, -1, 0)
    ub = jnp.sum(hzu * u, axis=0) / (z_w[-1] + shift(z_w[-1], 0, -1)
                                     - z_w[0] - shift(z_w[0], 0, -1))
    vb = jnp.sum(hzv * v, axis=0) / (z_w[-1] + shift(z_w[-1], -1, 0)
                                     - z_w[0] - shift(z_w[0], -1, 0))

    v2_2d = 0.5 * (ub ** 2 + shift(ub, 0, 1) ** 2
                   + vb ** 2 + shift(vb, 1, 0) ** 2)
    v2_3d = 0.5 * (u ** 2 + shift(u, 0, 1) ** 2
                   + v ** 2 + shift(v, 1, 0) ** 2)

    if cfg.masking:
        da = grid.rmask / (grid.pm * grid.pn)
    else:
        da = 1.0 / (grid.pm * grid.pn)

    ke = da * jnp.sum(0.5 * v2_3d * hz, axis=0)
    ke2b = da * 0.5 * (z_w[-1] - z_w[0]) * v2_2d
    cffg = cfg.g / cfg.rho0
    pe = da * (0.5 * cfg.g * z_w[-1] ** 2
               + jnp.sum(cffg * hz * state.rho * (state.z_r - z_w[0][None]),
                         axis=0))
    dvol = da * z_w[-1]

    # advective Courant numbers (diag.F:183-206)
    if cfg.masking:
        civ = cfg.dt * grid.rmask[None] * (grid.pm * grid.pn)[None] / hz
    else:
        civ = cfg.dt * (grid.pm * grid.pn)[None] / hz
    wtot = state.we + state.wi
    cw = civ * (jnp.maximum(wtot[1:], 0.0) - jnp.minimum(wtot[:-1], 0.0))
    cx = cw + civ * (jnp.maximum(shift(state.flx_u, 0, 1), 0.0)
                     - jnp.minimum(state.flx_u, 0.0)
                     + jnp.maximum(shift(state.flx_v, 1, 0), 0.0)
                     - jnp.minimum(state.flx_v, 0.0))

    cx_i = _interior(cx, h)
    cw_i = _interior(cw, h)
    flat = cx_i.reshape(cx_i.shape[0], -1)
    idx = jnp.argmax(flat)
    cu_adv = flat.reshape(-1)[idx]
    cu_w = cw_i.reshape(-1)[idx]

    s_zeta = jnp.sum(_interior(dvol, h))
    s_ke = jnp.sum(_interior(ke, h))
    s_pe = jnp.sum(_interior(pe, h))
    s_ke2b = jnp.sum(_interior(ke2b, h))
    denom = grid.volume + s_zeta
    return Diag(avke=s_ke / denom, avke2b=s_ke2b / denom, avpe=s_pe / denom,
                avzeta=s_zeta / grid.area, cu_adv=cu_adv, cu_w=cu_w,
                v2d_max=jnp.sqrt(jnp.max(_interior(v2_2d, h))))


def _local_fields(state: OceanState, grid: Grid, cfg: ModelConfig):
    """The per-point diagnostic fields reduced by compute_diag, factored
    out so the distributed path reduces the identical quantities
    (reference: diag.F:129-237 per-tile part)."""
    u = state.u_prev
    v = state.v_prev
    hz = state.hz
    z_w = state.z_w
    ub = jnp.sum((hz + shift(hz, 0, -1)) * u, axis=0) / (
        z_w[-1] + shift(z_w[-1], 0, -1) - z_w[0] - shift(z_w[0], 0, -1))
    vb = jnp.sum((hz + shift(hz, -1, 0)) * v, axis=0) / (
        z_w[-1] + shift(z_w[-1], -1, 0) - z_w[0] - shift(z_w[0], -1, 0))
    v2_2d = 0.5 * (ub ** 2 + shift(ub, 0, 1) ** 2
                   + vb ** 2 + shift(vb, 1, 0) ** 2)
    v2_3d = 0.5 * (u ** 2 + shift(u, 0, 1) ** 2
                   + v ** 2 + shift(v, 1, 0) ** 2)
    da = (grid.rmask if cfg.masking else 1.0) / (grid.pm * grid.pn)
    ke = da * jnp.sum(0.5 * v2_3d * hz, axis=0)
    ke2b = da * 0.5 * (z_w[-1] - z_w[0]) * v2_2d
    cffg = cfg.g / cfg.rho0
    pe = da * (0.5 * cfg.g * z_w[-1] ** 2
               + jnp.sum(cffg * hz * state.rho * (state.z_r - z_w[0][None]),
                         axis=0))
    dvol = da * z_w[-1]
    if cfg.masking:
        civ = cfg.dt * grid.rmask[None] * (grid.pm * grid.pn)[None] / hz
    else:
        civ = cfg.dt * (grid.pm * grid.pn)[None] / hz
    wtot = state.we + state.wi
    cw = civ * (jnp.maximum(wtot[1:], 0.0) - jnp.minimum(wtot[:-1], 0.0))
    cx = cw + civ * (jnp.maximum(shift(state.flx_u, 0, 1), 0.0)
                     - jnp.minimum(state.flx_u, 0.0)
                     + jnp.maximum(shift(state.flx_v, 1, 0), 0.0)
                     - jnp.minimum(state.flx_v, 0.0))
    return ke, ke2b, pe, dvol, cx, cw, v2_2d


def make_distributed_diag(cfg: ModelConfig, mesh):
    """Jitted distributed diagnostics over block-halo-layout state: each
    block reduces its owned interior, partial results are all-gathered and
    combined in fixed block order — the TPU analog of the reference's
    deterministic cross-rank tree reduction (reference: diag.F:434-470
    manual binary tree; determinism note diag.F:14)."""
    from functools import partial as _partial

    from jax import lax
    from jax.sharding import PartitionSpec as P
    from roms_tpu.parallel.dist import specs_like

    h = cfg.halo

    def local(state, grid):
        ke, ke2b, pe, dvol, cx, cw, v2_2d = _local_fields(state, grid, cfg)
        parts = jnp.stack([jnp.sum(_interior(f, h))
                           for f in (ke, ke2b, pe, dvol)])
        cx_i = _interior(cx, h)
        cw_i = _interior(cw, h)
        idx = jnp.argmax(cx_i.reshape(-1))
        my_cx = cx_i.reshape(-1)[idx]
        my_cw = cw_i.reshape(-1)[idx]
        my_v2 = jnp.max(_interior(v2_2d, h))
        # fixed-order combine: gather per-block rows over both mesh axes
        row = jnp.concatenate([parts, jnp.stack([my_cx, my_cw, my_v2])])
        allrows = lax.all_gather(row, "x")
        allrows = lax.all_gather(allrows, "y").reshape(-1, row.shape[0])
        sums = jnp.sum(allrows[:, :4], axis=0)  # fixed (y,x) block order
        ib = jnp.argmax(allrows[:, 4])
        cu_adv = allrows[ib, 4]
        cu_w = allrows[ib, 5]
        v2max = jnp.max(allrows[:, 6])
        denom = grid.volume + sums[3]
        return Diag(avke=sums[0] / denom, avke2b=sums[1] / denom,
                    avpe=sums[2] / denom, avzeta=sums[3] / grid.area,
                    cu_adv=cu_adv, cu_w=cu_w, v2d_max=jnp.sqrt(v2max))

    def wrapped(state, grid):
        # check_vma=False: the outputs are replicated by construction
        # (double all_gather), which the static analysis cannot infer
        return jax.shard_map(
            local, mesh=mesh,
            in_specs=(specs_like(state), specs_like(grid)),
            out_specs=Diag(*([P()] * 7)), check_vma=False)(state, grid)

    return jax.jit(wrapped)
