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


# ---------------------------------------------------------------------------
# deterministic, device-count-independent summation
# (reference: diag.F:14 SUM_BY_PAIRS + :434-470 manual binary tree — the
# reference guarantees sums independent of rank count; here the same
# guarantee comes from a CANONICAL 8x8 block decomposition of the global
# interior: every block is pairwise-tree-summed with an explicit, shape-
# independent pairing, then the 64 block sums are combined in one fixed
# pairwise tree.  Any mesh whose axes divide 8 — and any grid whose
# interior dims divide 8 — produces bitwise-identical diagnostics.)
# ---------------------------------------------------------------------------

NB_SUM = 8  # canonical sum-block grid (NB_SUM x NB_SUM blocks globally)


def _pairwise_last(x):
    """Exact pairwise binary-tree sum over the last axis (zero-padded to a
    power of two; explicit elementwise adds, so the pairing — hence the
    rounding — is independent of array layout and device count)."""
    n = x.shape[-1]
    m = 1 << max(n - 1, 0).bit_length()
    if m != n:
        pad = [(0, 0)] * (x.ndim - 1) + [(0, m - n)]
        x = jnp.pad(x, pad)
    while x.shape[-1] > 1:
        x = x[..., 0::2] + x[..., 1::2]
    return x[..., 0]


def _block_sums(f2d, nby, nbx):
    """Pairwise-tree sum of each (nby x nbx) block of a 2D field ->
    (nby, nbx) array of exact per-block sums."""
    ny, nx = f2d.shape
    by, bx = ny // nby, nx // nbx
    b = f2d.reshape(nby, by, nbx, bx).transpose(0, 2, 1, 3)
    return _pairwise_last(b.reshape(nby, nbx, by * bx))


def deterministic_sum(f2d):
    """Canonical-block pairwise sum of a full 2D interior field, universal
    over ANY interior shape: non-8-divisible dims are zero-padded into the
    canonical blocks (exact zeros change no partial sum), so the pairing —
    hence the rounding — depends only on the global interior shape.  The
    distributed diag reassembles the identical global field and calls THIS
    function, so single-device and any-mesh sums are bitwise identical on
    any grid (reference guarantee: diag.F:14 SUM_BY_PAIRS + :434-470 for
    any rank count)."""
    ny, nx = f2d.shape
    pn = (-ny) % NB_SUM
    px = (-nx) % NB_SUM
    if pn or px:
        f2d = jnp.pad(f2d, ((0, pn), (0, px)))
    blocks = _block_sums(f2d, NB_SUM, NB_SUM)
    return _pairwise_last(blocks.reshape(1, -1))[0]


def compute_diag(state: OceanState, grid: Grid, cfg: ModelConfig) -> Diag:
    """Diagnostics of the just-completed step.

    Uses the time-n velocity (state.u_prev — the reference's diag reads
    index nstp which still points at the pre-step level,
    reference: main.F:374-378 vs diag call at :490), the new Hz/z_w, the
    corrected n+1/2 fluxes, and the new density (reference: diag.F:129-237).
    """
    h = cfg.halo
    ke, ke2b, pe, dvol, cx, cw, v2_2d = _local_fields(state, grid, cfg)

    cx_i = _interior(cx, h)
    cw_i = _interior(cw, h)
    flat = cx_i.reshape(cx_i.shape[0], -1)
    idx = jnp.argmax(flat)
    cu_adv = flat.reshape(-1)[idx]
    cu_w = cw_i.reshape(-1)[idx]

    s_zeta = deterministic_sum(_interior(dvol, h))
    s_ke = deterministic_sum(_interior(ke, h))
    s_pe = deterministic_sum(_interior(pe, h))
    s_ke2b = deterministic_sum(_interior(ke2b, h))
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
    """Jitted distributed diagnostics over block-halo-layout state.

    The four volume sums are computed by all-gathering the per-shard 2D
    interior partial fields (a few hundred KB), reassembling the global
    interior in canonical (y, x) order, cropping the mesh-divisibility
    pad, and calling the SAME `deterministic_sum` as the single-device
    `compute_diag` — so single-device and any-mesh diagnostics are
    BITWISE identical on ANY grid and ANY mesh factorization (the TPU
    analog of the reference's rank-count-independent reduction,
    reference: diag.F:14 SUM_BY_PAIRS, :434-470 manual binary tree).
    `cfg` is the mesh-padded config (pad_for_mesh)."""
    from jax import lax
    from jax.sharding import PartitionSpec as P
    from roms_tpu.parallel.dist import specs_like

    h = cfg.halo
    my, mx = mesh.shape["y"], mesh.shape["x"]

    def _global_field(stacked):
        """(c, ry, rx) per-shard interior partials -> (c, ny, nx) global
        interior, pad cropped, replicated on every shard."""
        g = lax.all_gather(stacked, "x")        # (mx, c, ry, rx)
        g = lax.all_gather(g, "y")              # (my, mx, c, ry, rx)
        g = g.transpose(2, 0, 3, 1, 4).reshape(
            stacked.shape[0], cfg.ny, cfg.nx)
        return g[:, :cfg.ny - cfg.pad_n or None,
                 :cfg.nx - cfg.pad_e or None]

    def local(state, grid):
        ke, ke2b, pe, dvol, cx, cw, v2_2d = _local_fields(state, grid, cfg)
        cx_i = _interior(cx, h)
        cw_i = _interior(cw, h)
        idx = jnp.argmax(cx_i.reshape(-1))
        my_cx = cx_i.reshape(-1)[idx]
        my_cw = cw_i.reshape(-1)[idx]
        my_v2 = jnp.max(_interior(v2_2d, h))
        row = jnp.stack([my_cx, my_cw, my_v2])
        allrows = lax.all_gather(row, "x")
        allrows = lax.all_gather(allrows, "y").reshape(-1, row.shape[0])
        stacked = jnp.stack([_interior(f, h)
                             for f in (ke, ke2b, pe, dvol)])
        gf = _global_field(stacked)
        s_ke, s_ke2b, s_pe, s_zeta = (deterministic_sum(gf[0]),
                                      deterministic_sum(gf[1]),
                                      deterministic_sum(gf[2]),
                                      deterministic_sum(gf[3]))
        ib = jnp.argmax(allrows[:, 0])
        cu_adv = allrows[ib, 0]
        cu_w = allrows[ib, 1]
        v2max = jnp.max(allrows[:, 2])
        denom = grid.volume + s_zeta
        return Diag(avke=s_ke / denom, avke2b=s_ke2b / denom,
                    avpe=s_pe / denom, avzeta=s_zeta / grid.area,
                    cu_adv=cu_adv, cu_w=cu_w, v2d_max=jnp.sqrt(v2max))

    def wrapped(state, grid):
        # check_vma=False: the outputs are replicated by construction
        # (double all_gather), which the static analysis cannot infer
        return jax.shard_map(
            local, mesh=mesh,
            in_specs=(specs_like(state), specs_like(grid)),
            out_specs=Diag(*([P()] * 7)), check_vma=False)(state, grid)

    return jax.jit(wrapped)
