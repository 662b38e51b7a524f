"""Distributed stepping over a 2D device mesh.

The TPU-native replacement of the reference's MPI domain decomposition
(reference: src/mpi_setup.F NP_XI x NP_ETA rank grid + src/mpi_exchanges.F
halo messages): one `jax.sharding.Mesh(('y','x'))` over all chips, with the
state held in **block-halo layout** — each device owns its interior block
of the padded global array PLUS its own 2-deep ghost ring, exactly like an
MPI rank's local array in the reference (reference:
src/set_global_definitions.h:136-153 GLOBAL_2D_ARRAY with margins).

Inside `shard_map` every local block therefore looks like a small
single-block padded array, so `step_impl` runs verbatim; ghost zones are
refreshed by `HaloExchange` (lax.ppermute over ICI neighbor links) exactly
where the reference calls exchange_xxx, physical-edge ghost strips are kept
(not wrapped) on non-periodic axes, and the BC kernels apply only on blocks
owning a physical domain edge via the grid.own_w/e/s/n flags (the analog of
the reference's edge-rank logic, reference: src/mpi_setup.F:115-155).

Because the ghost rings are part of the persisted layout, the physical
boundary ring (the prognostic Orlanski/Flather ghost values) survives
between steps with no per-step pad/crop traffic.

Scaling story: each step performs O(10) 3D-field exchanges plus nfast 2D
exchanges in the barotropic scan — identical communication structure to the
reference (SURVEY.md §3.3) but compiled into one XLA program so XLA can
overlap collective DMA with interior compute.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from roms_tpu.config import ModelConfig
from roms_tpu.parallel.halo import HaloExchange


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """Factor the device count into a 2D ('y', 'x') mesh."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    py = int(np.floor(np.sqrt(n)))
    while n % py:
        py -= 1
    px = n // py
    dev_grid = np.asarray(devices).reshape(py, px)
    return Mesh(dev_grid, ("y", "x"))


# ---------------------------------------------------------------------------
# Leaf classification (by field name, since shapes are ambiguous: riv_trc is
# (nriv, nt), bry fields are (nz, edge), etc.)
# ---------------------------------------------------------------------------

# non-spatial array fields of Grid / Forcing / CdrForcing / OceanState
_REPLICATED = {
    "cs_w", "cs_r", "area", "volume", "iic", "time",
    "riv_vol", "riv_trc", "pipe_prf", "pipe_trc",
    "iloc", "jloc", "icdr", "prf", "flx",
    "own_w", "own_e", "own_s", "own_n", "j0", "i0",
}


def _leaf_name(path) -> str:
    for k in reversed(path):
        if hasattr(k, "name"):
            return k.name
        if hasattr(k, "key"):
            return str(k.key)
    return ""


def _leaf_kind(path, leaf) -> str:
    """'spatial' | 'edge_y' | 'edge_x' | 'replicated' for one pytree leaf."""
    name = _leaf_name(path)
    if name in _REPLICATED:
        return "replicated"
    # '_west' suffix for state/boundary leaves, exact bare names for the
    # upscale capture dict keys — a bare suffix match would misclassify
    # any future spatial leaf whose name merely ends in a direction
    if (name.endswith("_west") or name.endswith("_east")
            or name in ("west", "east")):
        return "edge_y"
    if (name.endswith("_south") or name.endswith("_north")
            or name in ("south", "north")):
        return "edge_x"
    if hasattr(leaf, "ndim") and leaf.ndim >= 2:
        return "spatial"
    return "replicated"


def _spec_of(kind: str, leaf) -> P:
    if kind == "spatial":
        return P(*([None] * (leaf.ndim - 2)), "y", "x")
    if kind == "edge_y":
        return P(*([None] * (leaf.ndim - 1)), "y")
    if kind == "edge_x":
        return P(*([None] * (leaf.ndim - 1)), "x")
    return P()


def specs_like(tree):
    """PartitionSpec pytree for a block-halo-layout tree."""
    return jax.tree_util.tree_map_with_path(
        lambda p, leaf: _spec_of(_leaf_kind(p, leaf), leaf), tree)


# ---------------------------------------------------------------------------
# Mesh-divisibility padding (the reverse of the reference's edge-rank
# remainder absorption, reference: src/mpi_setup.F:115-155): inert cells are
# appended beyond the east/north ghost ring so every block is equal-sized;
# masks are zero there, metrics replicated, and the kernels shift their
# east/north physical-edge indices by cfg.pad_e / cfg.pad_n.
# ---------------------------------------------------------------------------

# spatial leaves that must pad with ZEROS (masks gate physics; point-source
# face/index fields must not duplicate sources into the pad)
_PAD_ZERO = {"rmask", "umask", "vmask", "pmask", "riv_uflx", "riv_vflx",
             "pipe_idx"}


def pad_for_mesh(cfg: ModelConfig, mesh: Mesh) -> ModelConfig:
    """Padded config for this mesh (identity when already divisible)."""
    py, px = mesh.devices.shape
    pn = (-cfg.ny) % py
    pe = (-cfg.nx) % px
    if pe == 0 and pn == 0:
        return cfg
    if not cfg.masking:
        raise ValueError(
            "non-mesh-divisible grids require cfg.masking=True (padded "
            "cells are carried as inert land)")
    return cfg.replace(nx=cfg.nx + pe, ny=cfg.ny + pn, pad_e=pe, pad_n=pn)


def _pad_leaf(leaf, kind: str, name: str, pe: int, pn: int):
    """Append the inert pad to one padded-global leaf (numpy/jnp)."""
    if pe == 0 and pn == 0:
        return leaf
    a = np.asarray(leaf)
    mode = ("constant" if name in _PAD_ZERO else "edge")
    if kind == "spatial":
        pad = [(0, 0)] * (a.ndim - 2) + [(0, pn), (0, pe)]
    elif kind == "edge_y":
        pad = [(0, 0)] * (a.ndim - 1) + [(0, pn)]
    elif kind == "edge_x":
        pad = [(0, 0)] * (a.ndim - 1) + [(0, pe)]
    else:
        return leaf
    return np.pad(a, pad, mode=mode)


def _crop_leaf(leaf, kind: str, pe: int, pn: int):
    if pe == 0 and pn == 0:
        return leaf
    if kind == "spatial":
        return leaf[..., :leaf.shape[-2] - pn or None,
                    :leaf.shape[-1] - pe or None]
    if kind == "edge_y":
        return leaf[..., :leaf.shape[-1] - pn or None]
    if kind == "edge_x":
        return leaf[..., :leaf.shape[-1] - pe or None]
    return leaf


# ---------------------------------------------------------------------------
# Block-halo layout conversion (host side, at setup / output time)
# ---------------------------------------------------------------------------

def _block_axis(a, n_blocks: int, h: int, axis: int):
    """Cut one padded axis (len = interior + 2h) into n overlapping blocks
    of (interior/n + 2h), concatenated along the same axis."""
    m = (a.shape[axis] - 2 * h) // n_blocks
    parts = []
    for b in range(n_blocks):
        sl = [slice(None)] * a.ndim
        sl[axis] = slice(b * m, b * m + m + 2 * h)
        parts.append(a[tuple(sl)])
    return jnp.concatenate(parts, axis=axis)


def _unblock_axis(a, n_blocks: int, h: int, axis: int):
    """Inverse of _block_axis: reassemble the padded global axis, taking
    interiors from every block and the outer ghost strips from the two
    edge blocks."""
    a = np.asarray(a)
    mb = a.shape[axis] // n_blocks        # m + 2h
    m = mb - 2 * h
    out_len = n_blocks * m + 2 * h
    sh = list(a.shape)
    sh[axis] = out_len
    out = np.zeros(sh, a.dtype)

    def sl(arr, start, stop, ax):
        s = [slice(None)] * arr.ndim
        s[ax] = slice(start, stop)
        return s

    for b in range(n_blocks):
        src = a[tuple(sl(a, b * mb, (b + 1) * mb, axis))]
        lo = 0 if b == 0 else h
        hi = mb if b == n_blocks - 1 else mb - h
        out[tuple(sl(out, b * m + lo, b * m + hi, axis))] = \
            src[tuple(sl(src, lo, hi, axis))]
    return out


def to_blocked(tree, mesh: Mesh, h: int, put: bool = True,
               pads: tuple = (0, 0)):
    """Padded-global pytree → block-halo layout, device_put with the right
    sharding (the analog of the reference's `partit` splitting,
    reference: Tools-Roms/partit.F).  pads=(pad_n, pad_e) appends the
    mesh-divisibility pad first (see pad_for_mesh)."""
    py, px = mesh.devices.shape
    pn, pe = pads

    def conv(path, leaf):
        kind = _leaf_kind(path, leaf)
        name = _leaf_name(path)
        leaf = _pad_leaf(leaf, kind, name, pe, pn)
        if kind == "spatial":
            leaf = _block_axis(leaf, py, h, leaf.ndim - 2)
            leaf = _block_axis(leaf, px, h, leaf.ndim - 1)
        elif kind == "edge_y":
            leaf = _block_axis(leaf, py, h, leaf.ndim - 1)
        elif kind == "edge_x":
            leaf = _block_axis(leaf, px, h, leaf.ndim - 1)
        if put:
            leaf = jax.device_put(
                leaf, NamedSharding(mesh, _spec_of(kind, leaf)))
        return leaf

    return jax.tree_util.tree_map_with_path(conv, tree)


def from_blocked(tree, mesh: Mesh, h: int, pads: tuple = (0, 0)):
    """Block-halo layout pytree → padded-global numpy pytree (the analog of
    the reference's `ncjoin`, reference: Tools-Roms/ncjoin.F); crops the
    mesh-divisibility pad."""
    py, px = mesh.devices.shape
    pn, pe = pads

    def conv(path, leaf):
        kind = _leaf_kind(path, leaf)
        leaf = np.asarray(leaf)
        if kind == "spatial":
            leaf = _unblock_axis(leaf, px, h, leaf.ndim - 1)
            leaf = _unblock_axis(leaf, py, h, leaf.ndim - 2)
        elif kind == "edge_y":
            leaf = _unblock_axis(leaf, py, h, leaf.ndim - 1)
        elif kind == "edge_x":
            leaf = _unblock_axis(leaf, px, h, leaf.ndim - 1)
        return _crop_leaf(leaf, kind, pe, pn)

    return jax.tree_util.tree_map_with_path(conv, tree)


# ---------------------------------------------------------------------------
# The distributed step
# ---------------------------------------------------------------------------

def _with_ownership(grid, cfg: ModelConfig, py: int, px: int):
    """Attach per-block physical-edge ownership flags + block offsets
    (reference: src/mpi_setup.F:115-155 edge-rank logic)."""
    iy = lax.axis_index("y")
    ix = lax.axis_index("x")
    my = cfg.ny // py
    mx = cfg.nx // px
    return grid.replace(
        own_w=(ix == 0), own_e=(ix == px - 1),
        own_s=(iy == 0), own_n=(iy == py - 1),
        j0=iy * my, i0=ix * mx)


def make_distributed_step(cfg: ModelConfig, mesh: Mesh):
    """Build jitted distributed steps (first_step True/False):
    (state, forcing, grid, w1, w2) -> state, everything in block-halo
    layout sharded P(.., 'y', 'x')."""
    from roms_tpu.stepper import step_impl

    py, px = mesh.devices.shape
    cfg = pad_for_mesh(cfg, mesh)   # no-op when already divisible
    if cfg.ny // py < 4 or cfg.nx // px < 4:
        raise ValueError("blocks must be at least 4 points wide")

    def _assemble_locals(out, grid):
        """Per-block diagnostics -> globally meaningful leaves.

        Budgets (t_budget/uv_budget) are plain spatial fields — sharded
        like the state, reassembled by from_blocked.  Upscale strips are
        valid only on edge-owning blocks: zero elsewhere and psum across
        the normal mesh axis, leaving a strip replicated over that axis
        and sharded along the edge (reference: upscale_output.F records
        only on boundary ranks)."""
        if out.upscale is None:
            return out
        up = {}
        for e, own, ax in (("west", grid.own_w, "x"),
                           ("east", grid.own_e, "x"),
                           ("south", grid.own_s, "y"),
                           ("north", grid.own_n, "y")):
            if e in out.upscale:
                s = out.upscale[e]
                up[e] = lax.psum(jnp.where(own, s, 0.0), ax)
        return out.replace(upscale=up)

    ex = HaloExchange(h=cfg.halo, ew_periodic=cfg.ew_periodic,
                      ns_periodic=cfg.ns_periodic)

    def local_step(state, forcing, grid, w1, w2, first_step):
        grid = _with_ownership(grid, cfg, py, px)
        out = step_impl(state, forcing, grid, w1, w2, cfg, first_step, ex)
        return _assemble_locals(out, grid)

    def _out_specs(state):
        sp = specs_like(state)
        if cfg.tracer_diagnostics:
            sp = sp.replace(t_budget={
                k: P(None, None, "y", "x")
                for k in ("hadv", "vadv", "forc", "vmix", "rate")})
        if cfg.uv_diagnostics:
            terms = ("pgr", "cori", "adv", "hmix", "vmix", "coup", "rate")
            sp = sp.replace(uv_budget={
                c: {k: P(None, "y", "x") for k in terms} for c in ("u", "v")})
        if cfg.upscale_output:
            usp = {}
            if cfg.obc_west:
                usp["west"] = P(None, None, "y")
            if cfg.obc_east:
                usp["east"] = P(None, None, "y")
            if cfg.obc_south:
                usp["south"] = P(None, None, "x")
            if cfg.obc_north:
                usp["north"] = P(None, None, "x")
            sp = sp.replace(upscale=usp)
        return sp

    def build(first_step: bool):
        fn = partial(local_step, first_step=first_step)

        def wrapped(state, forcing, grid, w1, w2):
            in_specs = (specs_like(state), specs_like(forcing),
                        specs_like(grid), P(), P())
            # check_vma=False: the Pallas kernels inside the step emit
            # ShapeDtypeStruct outputs without varying-mesh-axis
            # annotations; the legacy (unchecked) collective semantics are
            # what this step was written and tested against
            return jax.shard_map(fn, mesh=mesh, in_specs=in_specs,
                                 out_specs=_out_specs(state),
                                 check_vma=False)(
                state, forcing, grid, w1, w2)
        return jax.jit(wrapped)

    return build(True), build(False)


def shard_tree(tree, mesh: Mesh):
    """device_put a block-halo-layout pytree with its natural sharding."""
    def put(path, a):
        return jax.device_put(
            a, NamedSharding(mesh, _spec_of(_leaf_kind(path, a), a)))
    return jax.tree_util.tree_map_with_path(put, tree)


# ---------------------------------------------------------------------------
# Multi-host entry (reference: the MPI world spanning hosts, src/main.F:26
# MPI_Init + src/mpi_setup.F; SURVEY §2.2 item 5)
# ---------------------------------------------------------------------------

def init_multihost(coordinator_address: str | None = None,
                   num_processes: int | None = None,
                   process_id: int | None = None,
                   dcn_axis: str = "y") -> Mesh:
    """Initialize the JAX distributed runtime and build the global 2D
    ('y','x') mesh over every chip of every host.

    The DCN (cross-host) boundary is aligned with ONE mesh axis
    (`dcn_axis`): each host's chips form contiguous blocks along the
    other axis, so all halo traffic on the non-DCN axis and all but one
    neighbor link on the DCN axis ride ICI; only the shard-boundary rows
    between hosts cross DCN — the layout the scaling-book recipe
    prescribes for stencil halo exchange.

    On TPU pods the arguments are auto-detected from the environment
    (jax.distributed.initialize() with no args); pass them explicitly for
    manual process launch.  Single-process callers (tests, one host) may
    call with num_processes=1.
    """
    import jax

    if num_processes == 1 and coordinator_address is None:
        # single-process bring-up (tests, one host): jax.distributed still
        # requires a coordinator endpoint, so run one on a free local port
        import socket
        with socket.socket() as s:
            s.bind(("localhost", 0))
            coordinator_address = f"localhost:{s.getsockname()[1]}"
        process_id = 0
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return _multihost_mesh(jax.devices(), jax.process_count(), dcn_axis)


def _multihost_mesh(devices, nproc: int, dcn_axis: str = "y") -> Mesh:
    """Pure mesh-layout rule for `init_multihost` (unit-tested without a
    real multi-process runtime): hosts stacked along the DCN axis, each
    host's chips contiguous along the other axis."""
    if nproc == 1:
        return make_mesh(devices=devices)
    per_host = len(devices) // nproc
    dev_grid = np.asarray(sorted(devices, key=lambda d: (d.process_index,
                                                         d.id)))
    dev_grid = dev_grid.reshape(nproc, per_host)
    if dcn_axis == "y":
        return Mesh(dev_grid, ("y", "x"))
    return Mesh(dev_grid.T.copy(), ("y", "x"))
