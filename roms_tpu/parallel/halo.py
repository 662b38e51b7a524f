"""Halo (ghost-cell) management.

Every horizontal field carries `H` ghost cells on each side of the (j, i)
dims, mirroring the reference's MPI-local arrays with 2-deep margins
(reference: src/set_global_definitions.h:136-153).  Stencil kernels are
written against these padded arrays via `shift()`; after a kernel writes a
field, its ghost zones are stale and must be refreshed exactly where the
reference calls `exchange_xxx` (reference: src/mpi_exchanges.F:34-42).

Two interchangeable halo backends:

  * `periodic_fill` — single-block doubly-periodic wrap (in-array copies).
  * `HaloExchange` on a 2D device mesh — inside `shard_map`, ghost strips are
    exchanged with the 4 edge neighbors using two sequential axis sweeps of
    `lax.ppermute` (x first, then y including the freshly filled corner
    columns), which makes the 8-neighbor corner pattern of the reference
    (reference: src/mpi_exchanges.F:672-800) collapse into 2 collectives.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax


def shift(a: jax.Array, dj: int = 0, di: int = 0) -> jax.Array:
    """Return array whose [.., j, i] element equals a[.., j+dj, i+di].

    Implemented as a roll on the *padded* array: values are correct wherever
    (j+dj, i+di) stays in bounds; out-of-range entries land in ghost zones,
    which are refreshed by the next halo fill.  Stencil reach must not exceed
    the halo width between fills — the reference's exchange placement
    guarantees reach <= 2 and we mirror it call-for-call.
    """
    if dj == 0 and di == 0:
        return a
    return jnp.roll(a, shift=(-dj, -di), axis=(-2, -1))


def eset(a: jax.Array, idx, val, flag) -> jax.Array:
    """`a.at[idx].set(val)` gated by an edge-ownership flag.

    flag is None in single-block mode (the block owns every physical edge)
    → a plain scatter.  Inside shard_map, flag is a traced scalar bool
    (from `lax.axis_index`) and the update is applied only on shards whose
    block touches that physical domain edge — the TPU analog of the
    reference's per-rank edge tests (reference: src/u2dbc_im.F WESTERN_EDGE
    etc. via istr/iend trimming, src/mpi_setup.F:115-155)."""
    if flag is None:
        return a.at[idx].set(val)
    return a.at[idx].set(jnp.where(flag, val, a[idx]))


def band(f1, f2):
    """AND of two optional ownership flags (None = owned)."""
    if f1 is None:
        return f2
    if f2 is None:
        return f1
    return jnp.logical_and(f1, f2)


def periodic_fill(a: jax.Array, h: int = 2) -> jax.Array:
    """Refresh ghost cells of a doubly-periodic single-block field.

    Equivalent to the reference's periodic branch of exchange_xxx
    (reference: src/mpi_exchanges.F periodic ghost-point copies).
    X sweep first, then Y sweep including the x-ghost columns → corners
    correct after two sweeps.
    """
    a = a.at[..., :, :h].set(a[..., :, -2 * h:-h])
    a = a.at[..., :, -h:].set(a[..., :, h:2 * h])
    a = a.at[..., :h, :].set(a[..., -2 * h:-h, :])
    a = a.at[..., -h:, :].set(a[..., h:2 * h, :])
    return a


def mixed_fill(a: jax.Array, h: int = 2,
               ew_periodic: bool = True,
               ns_periodic: bool = True) -> jax.Array:
    """Wrap ghost cells on the periodic axes; on closed (physical-boundary)
    axes, replicate the BC-maintained ring line (index h-1 / -h) outward
    into the deeper ghost lines.

    The reference never reads or writes the outer ghost lines on physical
    edges (exchange_xxx skips them, src/mpi_exchanges.F; stencil reach from
    the interior stops at istr-1).  Here the roll-based kernels *compute*
    wrap-seam values into those lines; the interior is arithmetically
    decoupled from them (the advective edge-extrapolation fixes exist for
    exactly that, reference: compute_horiz_tracer_fluxes.h:74-83), but the
    uncontrolled seam dynamics can overflow, and inf*0 = nan defeats the
    mask/edge-fix decoupling.  Replicating the ring keeps every ghost line
    bounded and deterministic without touching interior trajectories.

    Implementation note (measured, kept for the record): expressing the
    physical-edge replications as `jnp.where` select chains instead of
    scatter updates REGRESSES the production step 146 -> 161 ms
    (scripts/ab_fill A/B on the chip) — XLA:TPU already aliases these
    dynamic-update-slices in place, while a select chain forces full
    read+write passes per edge.  Keep the scatter form."""
    if ew_periodic:
        a = a.at[..., :, :h].set(a[..., :, -2 * h:-h])
        a = a.at[..., :, -h:].set(a[..., :, h:2 * h])
    else:
        a = a.at[..., :, :h - 1].set(a[..., :, h - 1:h])
        a = a.at[..., :, -(h - 1):].set(a[..., :, -h:-h + 1])
    if ns_periodic:
        a = a.at[..., :h, :].set(a[..., -2 * h:-h, :])
        a = a.at[..., -h:, :].set(a[..., h:2 * h, :])
    else:
        a = a.at[..., :h - 1, :].set(a[..., h - 1:h, :])
        a = a.at[..., -(h - 1):, :].set(a[..., -h:-h + 1, :])
    return a


class HaloExchange:
    """Distributed halo exchange over a 2D device mesh ('y', 'x').

    Used *inside* shard_map: each device holds a local block padded with `h`
    ghost cells.  `__call__` refreshes the ghosts from the 4 edge neighbors
    via `lax.ppermute` ring permutations (periodic rings over the mesh axes),
    corner-correct via the two-sweep order.  This is the TPU-native
    replacement for the reference's 8-direction nonblocking MPI halo
    exchange (reference: src/mpi_exchanges.F:672-800): edge transfers ride
    the ICI neighbor links, and the corner messages are subsumed by sweeping
    x before y.

    On non-periodic axes the blocks at the physical domain edge KEEP their
    outer ghost strips (they hold the physical boundary ring maintained by
    the BC kernels) instead of accepting the wrap-around message — the
    analog of the reference's exchange skipping physical edges
    (reference: src/mpi_exchanges.F west_msg_exch guards).
    """

    def __init__(self, axis_x: str = "x", axis_y: str = "y", h: int = 2,
                 ew_periodic: bool = True, ns_periodic: bool = True):
        self.ax = axis_x
        self.ay = axis_y
        self.h = h
        self.ew_periodic = ew_periodic
        self.ns_periodic = ns_periodic

    def _perm(self, axis_name, direction):
        n = lax.axis_size(axis_name)
        return [(i, (i + direction) % n) for i in range(n)]

    def __call__(self, a: jax.Array) -> jax.Array:
        h = self.h
        # --- X sweep: send east strip to eastern neighbor's west ghost etc.
        east_strip = a[..., :, -2 * h:-h]   # my interior east edge
        west_strip = a[..., :, h:2 * h]     # my interior west edge
        from_west = lax.ppermute(east_strip, self.ax, self._perm(self.ax, +1))
        from_east = lax.ppermute(west_strip, self.ax, self._perm(self.ax, -1))
        if not self.ew_periodic:
            # physical-edge blocks: keep the BC-maintained ring line (h-1 /
            # -h) and replicate it outward (same semantics as mixed_fill)
            ix = lax.axis_index(self.ax)
            nx_ = lax.axis_size(self.ax)
            ring_w = jnp.broadcast_to(a[..., :, h - 1:h], a[..., :, :h].shape)
            ring_e = jnp.broadcast_to(a[..., :, -h:-h + 1], a[..., :, -h:].shape)
            from_west = jnp.where(ix == 0, ring_w, from_west)
            from_east = jnp.where(ix == nx_ - 1, ring_e, from_east)
        a = a.at[..., :, :h].set(from_west)
        a = a.at[..., :, -h:].set(from_east)
        # --- Y sweep (includes x ghosts → corners become correct)
        north_strip = a[..., -2 * h:-h, :]
        south_strip = a[..., h:2 * h, :]
        from_south = lax.ppermute(north_strip, self.ay, self._perm(self.ay, +1))
        from_north = lax.ppermute(south_strip, self.ay, self._perm(self.ay, -1))
        if not self.ns_periodic:
            jy = lax.axis_index(self.ay)
            ny_ = lax.axis_size(self.ay)
            ring_s = jnp.broadcast_to(a[..., h - 1:h, :], a[..., :h, :].shape)
            ring_n = jnp.broadcast_to(a[..., -h:-h + 1, :], a[..., -h:, :].shape)
            from_south = jnp.where(jy == 0, ring_s, from_south)
            from_north = jnp.where(jy == ny_ - 1, ring_n, from_north)
        a = a.at[..., :h, :].set(from_south)
        a = a.at[..., -h:, :].set(from_north)
        return a


def make_halo_fill(cfg, distributed: bool = False):
    """Return the halo-refresh function for this configuration."""
    if distributed:
        return HaloExchange(h=cfg.halo)
    if cfg.fully_periodic:
        return partial(periodic_fill, h=cfg.halo)
    return partial(mixed_fill, h=cfg.halo,
                   ew_periodic=cfg.ew_periodic, ns_periodic=cfg.ns_periodic)


def halo_group(halo, *arrays):
    """ONE fused halo refresh for several fields sharing trailing (jy, ix):
    flatten leading dims, concatenate, exchange once, split.  The analog of
    the reference's multi-array exchange packing up to four arrays into one
    message round (reference: src/mpi_exchanges.F:34-42 exchange_xxx
    overloads) — on the mesh it turns N ppermutes per direction into one.
    """
    if len(arrays) == 1:
        return (halo(arrays[0]),)
    jyix = arrays[0].shape[-2:]
    flats, ks, shapes = [], [], []
    for a in arrays:
        shapes.append(a.shape)
        k = 1
        for d in a.shape[:-2]:
            k *= d
        ks.append(k)
        flats.append(a.reshape((k,) + jyix))
    big = halo(jnp.concatenate(flats, axis=0))
    out, o = [], 0
    for k, shp in zip(ks, shapes):
        out.append(big[o:o + k].reshape(shp))
        o += k
    return tuple(out)
