"""Lagrangian particles in continuous index space
(reference: src/particles.F).

Positions live in the reference's fractional-index convention: px in
[-0.5, nx+0.5] over rho cells, pz in [0, nz] over levels.  Velocities are
trilinearly interpolated (reference: particles.F:504-560 rhs_particles,
interp_2D/interp_3D) and positions advance with AB2
(reference: particles.F:213-267 advance_particles).

TPU-first: the per-particle loop becomes fully vectorized gathers over a
fixed-size particle array — one fused kernel per step, no host round-trip.
Inactive slots (mask False) let the population grow/shrink under static
shapes.  Out-of-domain particles wrap on periodic axes and deactivate on
open/closed edges (the reference migrates them between MPI ranks instead,
particles.F:661-840 — unnecessary here because fields are globally
addressable under one mesh; a sharded gather is the multi-chip path).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from flax import struct

from roms_tpu.config import ModelConfig


@struct.dataclass
class ParticleState:
    px: jax.Array      # (npart,) fractional xi index
    py: jax.Array
    pz: jax.Array      # fractional level, [0, nz]
    dpxm: jax.Array    # previous AB2 rates
    dpym: jax.Array
    dpzm: jax.Array
    active: jax.Array  # (npart,) bool
    first: jax.Array   # scalar bool: AB2 startup flag
    n_bot: jax.Array   # bottom-clamp counter (reference: particles.F:253-256)
    n_sur: jax.Array


def seed_particles(px, py, pz, npart_max: int | None = None,
                   dtype=jnp.float64) -> ParticleState:
    """Build a ParticleState from position arrays; extra capacity up to
    npart_max is allocated inactive."""
    px = jnp.asarray(px, dtype)
    n = px.shape[0]
    cap = npart_max or n
    pad = cap - n

    def fit(a):
        return jnp.concatenate([jnp.asarray(a, dtype), jnp.zeros(pad, dtype)])

    z = jnp.zeros(cap, dtype)
    return ParticleState(
        px=fit(px), py=fit(py), pz=fit(pz),
        dpxm=z, dpym=z, dpzm=z,
        active=jnp.concatenate([jnp.ones(n, bool), jnp.zeros(pad, bool)]),
        first=jnp.asarray(True),
        n_bot=jnp.zeros((), jnp.int32), n_sur=jnp.zeros((), jnp.int32))


def _interp2(f, jj, ii, y, x):
    """Bilinear gather: f (jy, ix) at padded base indices (jj, ii)."""
    f00 = f[jj, ii]
    f01 = f[jj, ii + 1]
    f10 = f[jj + 1, ii]
    f11 = f[jj + 1, ii + 1]
    return ((1 - y) * ((1 - x) * f00 + x * f01)
            + y * ((1 - x) * f10 + x * f11))


def _interp3(f, kk, jj, ii, z, y, x):
    """Trilinear gather: f (nz.., jy, ix) at base indices (kk, jj, ii)."""
    f0 = (1 - x) * ((1 - y) * f[kk, jj, ii] + y * f[kk, jj + 1, ii]) \
        + x * ((1 - y) * f[kk, jj, ii + 1] + y * f[kk, jj + 1, ii + 1])
    k1 = kk + 1
    f1 = (1 - x) * ((1 - y) * f[k1, jj, ii] + y * f[k1, jj + 1, ii]) \
        + x * ((1 - y) * f[k1, jj, ii + 1] + y * f[k1, jj + 1, ii + 1])
    return (1 - z) * f0 + z * f1


def rhs_particles(ps: ParticleState, u, v, we, wi, hz, grid,
                  cfg: ModelConfig):
    """Index-space displacement rates (reference: particles.F:475-573)."""
    nz = cfg.nz
    # Fortran base indices (reference: particles.F:507-521)
    i = jnp.floor(ps.px + 0.5).astype(jnp.int32)
    j = jnp.floor(ps.py + 0.5).astype(jnp.int32)
    k = jnp.clip(jnp.floor(ps.pz + 0.5).astype(jnp.int32), 1, nz - 1)
    iu = jnp.floor(ps.px + 1.0).astype(jnp.int32)
    jv = jnp.floor(ps.py + 1.0).astype(jnp.int32)
    kw = jnp.clip(jnp.floor(ps.pz).astype(jnp.int32), 0, nz - 1)
    x = ps.px - i + 0.5
    y = ps.py - j + 0.5
    z = ps.pz - k + 0.5
    xu = ps.px - iu + 1.0
    yv = ps.py - jv + 1.0
    zw = ps.pz - kw

    # padded-layout conversion (Fortran index -> python index + 1) with
    # clipping to keep gathers in bounds for stray particles
    h = cfg.halo
    jy, ix = grid.pm.shape
    ip = jnp.clip(i + 1, 0, ix - 2)
    jp = jnp.clip(j + 1, 0, jy - 2)
    iup = jnp.clip(iu + 1, 0, ix - 2)
    jvp = jnp.clip(jv + 1, 0, jy - 2)
    kr = k - 1          # rho-level python index of Fortran level k

    pu = _interp3(u, kr, jp, iup, z, y, xu)
    pv = _interp3(v, kr, jvp, ip, z, yv, x)
    wp = (we + wi) * (grid.pm * grid.pn)[None]  # (reference: :499-501)
    pw = _interp3(wp, kw, jp, ip, zw, y, x)

    pdxi = _interp2(grid.pm, jp, ip, y, x)
    pdyi = _interp2(grid.pn, jp, ip, y, x)
    pdz = _interp3(hz, kr, jp, ip, z, y, x)

    dt = cfg.dt
    prx = dt * pu * pdxi
    pry = dt * pv * pdyi
    prz = dt * pw / pdz
    live = ps.active & (ps.pz < 2 * nz)
    zero = jnp.zeros_like(prx)
    return (jnp.where(live, prx, zero), jnp.where(live, pry, zero),
            jnp.where(live, prz, zero))


@partial(jax.jit, static_argnames=("cfg",))
def advance_particles(ps: ParticleState, u, v, we, wi, hz, grid,
                      cfg: ModelConfig) -> ParticleState:
    """One AB2 particle step (reference: particles.F:213-267)."""
    prx, pry, prz = rhs_particles(ps, u, v, we, wi, hz, grid, cfg)
    return _ab2_update(ps, prx, pry, prz, cfg)


def _ab2_update(ps: ParticleState, prx, pry, prz,
                cfg: ModelConfig) -> ParticleState:
    dpxm = jnp.where(ps.first, prx, ps.dpxm)
    dpym = jnp.where(ps.first, pry, ps.dpym)
    dpzm = jnp.where(ps.first, prz, ps.dpzm)

    px = ps.px + 1.5 * prx - 0.5 * dpxm
    py = ps.py + 1.5 * pry - 0.5 * dpym
    pz = ps.pz + 1.5 * prz - 0.5 * dpzm

    # vertical clamping (reference: particles.F:252-261)
    hit_bot = pz < 0.0
    hit_sur = pz > cfg.nz
    pz = jnp.where(hit_bot, 0.02, pz)
    pz = jnp.where(hit_sur, cfg.nz - 0.02, pz)

    # horizontal wrap (periodic) or deactivate (outflow)
    active = ps.active
    if cfg.ew_periodic:
        px = jnp.mod(px + 0.5, float(cfg.nx)) - 0.5
    else:
        active = active & (px > -0.5) & (px < cfg.nx + 0.5)
    if cfg.ns_periodic:
        py = jnp.mod(py + 0.5, float(cfg.ny)) - 0.5
    else:
        active = active & (py > -0.5) & (py < cfg.ny + 0.5)

    return ps.replace(
        px=px, py=py, pz=pz, dpxm=prx, dpym=pry, dpzm=prz,
        active=active, first=jnp.asarray(False),
        n_bot=ps.n_bot + jnp.sum(hit_bot & ps.active, dtype=jnp.int32),
        n_sur=ps.n_sur + jnp.sum(hit_sur & ps.active, dtype=jnp.int32))


class ParticleWriter:
    """Trajectory output (reference: particles.F:389-473 wrt_particles +
    Tools-Roms particle_join — one global file, no joining needed)."""

    def __init__(self, path: str, npart: int, cfg: ModelConfig):
        from roms_tpu.io.netcdf import NCWriter
        from roms_tpu.io.output import provenance_attrs
        self.nc = NCWriter(path, provenance_attrs(cfg))
        self.nc.create_dim("time", None)
        self.nc.create_dim("particle", npart)
        self.nc.create_var("ptime", ("time",), "f8")
        for v in ("px", "py", "pz"):
            self.nc.create_var(v, ("time", "particle"), "f8")
        self.nc.create_var("active", ("time", "particle"), "i4")
        self.rec = 0

    def write(self, ps: ParticleState, time: float):
        import numpy as np
        self.nc.write("ptime", float(time), rec=self.rec)
        for v in ("px", "py", "pz"):
            self.nc.write(v, np.asarray(getattr(ps, v)), rec=self.rec)
        self.nc.write("active", np.asarray(ps.active, dtype="i4"),
                      rec=self.rec)
        self.rec += 1
        self.nc.sync()

    def close(self):
        self.nc.close()


def make_distributed_particle_step(cfg: ModelConfig, mesh):
    """Jitted particle step over block-halo-layout fields.

    TPU-first replacement for the reference's 8-neighbor particle
    migration (reference: particles.F:661-840, :935-1010): the particle
    array is REPLICATED across the mesh; each block computes displacement
    rates only for particles whose base cell lies in its interior (a
    local gather over its halo'd fields — bitwise-equal to the global
    gather), non-owners contribute zeros, and a psum over both mesh axes
    replicates the full rates.  No particle ever moves between shards —
    ownership re-evaluates from the position every step.

    Usage: fields in block-halo layout (sharded P('y','x')), ParticleState
    replicated; returns the updated replicated ParticleState.
    """
    from jax import lax
    from jax.sharding import PartitionSpec as P
    from roms_tpu.parallel.dist import pad_for_mesh, specs_like

    cfg_p = pad_for_mesh(cfg, mesh)
    py_, px_ = mesh.devices.shape
    my, mx = cfg_p.ny // py_, cfg_p.nx // px_

    def local(ps, u, v, we, wi, hz, grid):
        iy = lax.axis_index("y")
        ix = lax.axis_index("x")
        j0 = iy * my
        i0 = ix * mx
        i = jnp.floor(ps.px + 0.5).astype(jnp.int32)
        j = jnp.floor(ps.py + 0.5).astype(jnp.int32)
        c_i = jnp.clip(i, 1, cfg.nx) - 1   # owning interior cell
        c_j = jnp.clip(j, 1, cfg.ny) - 1
        own = ((c_i >= i0) & (c_i < i0 + mx)
               & (c_j >= j0) & (c_j < j0 + my) & ps.active)
        ps_loc = ps.replace(px=ps.px - i0, py=ps.py - j0)
        prx, pry, prz = rhs_particles(ps_loc, u, v, we, wi, hz, grid, cfg)
        zero = jnp.zeros_like(prx)
        prx = lax.psum(jnp.where(own, prx, zero), ("x", "y"))
        pry = lax.psum(jnp.where(own, pry, zero), ("x", "y"))
        prz = lax.psum(jnp.where(own, prz, zero), ("x", "y"))
        return _ab2_update(ps, prx, pry, prz, cfg)

    def wrapped(ps, u, v, we, wi, hz, grid):
        pspec = jax.tree_util.tree_map(lambda _: P(), ps)
        fspec = P(*([None] * 1), "y", "x")
        return jax.shard_map(
            local, mesh=mesh,
            in_specs=(pspec, fspec, fspec, fspec, fspec, fspec,
                      specs_like(grid)),
            out_specs=pspec, check_vma=False)(ps, u, v, we, wi, hz, grid)

    return jax.jit(wrapped)
