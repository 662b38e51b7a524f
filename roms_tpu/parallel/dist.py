"""Distributed stepping over a 2D device mesh.

The TPU-native replacement of the reference's MPI domain decomposition
(reference: src/mpi_setup.F NP_XI x NP_ETA rank grid + src/mpi_exchanges.F
halo messages): one `jax.sharding.Mesh(('y','x'))` over all chips, state
stored as *unpadded* global arrays sharded over their trailing (j, i) dims,
and the full baroclinic step run under `shard_map`.  Inside the mapped
function every field is locally padded with 2 ghost cells and refreshed by
`HaloExchange` (lax.ppermute over ICI neighbor links) exactly where the
reference calls exchange_xxx.

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
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from roms_tpu.config import ModelConfig
from roms_tpu.parallel.halo import HaloExchange
from roms_tpu.stepper import step_impl


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


def _is_spatial(leaf) -> bool:
    return hasattr(leaf, "ndim") and leaf.ndim >= 2


def _spec_for(leaf):
    if _is_spatial(leaf):
        return P(*([None] * (leaf.ndim - 2)), "y", "x")
    return P()


def specs_like(tree):
    return jax.tree_util.tree_map(_spec_for, tree)


def pad_local(a, h: int):
    if not _is_spatial(a):
        return a
    widths = [(0, 0)] * (a.ndim - 2) + [(h, h), (h, h)]
    return jnp.pad(a, widths)


def crop_local(a, h: int):
    if not _is_spatial(a):
        return a
    return a[..., h:-h, h:-h]


def unpad_tree(tree, h: int):
    """Strip the global ghost ring (host-side state → distributed layout)."""
    return jax.tree_util.tree_map(lambda a: crop_local(a, h), tree)


def pad_tree_periodic(tree, h: int, halo_fill):
    """Re-attach a ghost ring on a gathered global state."""
    return jax.tree_util.tree_map(
        lambda a: halo_fill(pad_local(a, h)) if _is_spatial(a) else a, tree)


def make_distributed_step(cfg: ModelConfig, mesh: Mesh):
    """Build a jitted distributed step: (state, forcing, grid, w1, w2,
    first_step) -> state, with all spatial arrays unpadded and sharded
    P(..., 'y', 'x')."""
    ex = HaloExchange(axis_x="x", axis_y="y", h=cfg.halo)

    def local_step(state, forcing, grid, w1, w2, first_step):
        pad = lambda t: jax.tree_util.tree_map(
            lambda a: ex(pad_local(a, cfg.halo)) if _is_spatial(a) else a, t)
        state_p = pad(state)
        forcing_p = pad(forcing)
        grid_p = pad(grid)
        out = step_impl(state_p, forcing_p, grid_p, w1, w2, cfg,
                        first_step, ex)
        return jax.tree_util.tree_map(lambda a: crop_local(a, cfg.halo), out)

    def build(first_step: bool):
        fn = partial(local_step, first_step=first_step)

        def wrapped(state, forcing, grid, w1, w2):
            in_specs = (specs_like(state), specs_like(forcing),
                        specs_like(grid), P(), P())
            out_specs = specs_like(state)
            return jax.shard_map(fn, mesh=mesh, in_specs=in_specs,
                                 out_specs=out_specs)(
                state, forcing, grid, w1, w2)
        return jax.jit(wrapped)

    return build(True), build(False)


def shard_tree(tree, mesh: Mesh):
    """device_put a pytree of unpadded global arrays with (..,'y','x')
    sharding (scalars/1D replicated)."""
    def put(a):
        if _is_spatial(a):
            return jax.device_put(a, NamedSharding(mesh, _spec_for(a)))
        return jax.device_put(a, NamedSharding(mesh, P()))
    return jax.tree_util.tree_map(put, tree)
