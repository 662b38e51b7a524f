"""Distributed (shard_map) equivalence: the block-halo distributed step on
an 8-virtual-device 2D mesh must reproduce the single-block step to
round-off, for periodic, open-boundary, and masked/river configurations.

This is the analog of the reference's requirement that results be
independent of the rank decomposition (reference: src/mpi_exchanges.F,
tests run on 3x2 ranks vs the same physics on 1 rank), plus a unit test of
the halo-exchange primitive itself (reference: src/mpi_test.F).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from roms_tpu.ops.weights import set_weights
from roms_tpu.parallel.dist import (from_blocked, make_distributed_step,
                                    make_mesh, to_blocked)
from roms_tpu.parallel.halo import periodic_fill
from roms_tpu.stepper import step

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 (virtual) devices")

H = 2


def _run_single(cfg, grid, st, frc, nsteps):
    w1, w2, _ = set_weights(cfg.ndtfast)
    w1 = jnp.asarray(w1, jnp.float64)
    w2 = jnp.asarray(w2, jnp.float64)
    s = step(st, frc, grid, w1, w2, cfg, first_step=True)
    for _ in range(nsteps - 1):
        s = step(s, frc, grid, w1, w2, cfg, first_step=False)
    return s


def _run_dist(cfg, grid, st, frc, nsteps, mesh):
    w1, w2, _ = set_weights(cfg.ndtfast)
    w1 = jnp.asarray(w1, jnp.float64)
    w2 = jnp.asarray(w2, jnp.float64)
    st_b = to_blocked(st, mesh, cfg.halo)
    frc_b = to_blocked(frc, mesh, cfg.halo)
    grid_b = to_blocked(grid, mesh, cfg.halo)
    step_first, step_rest = make_distributed_step(cfg, mesh)
    s = step_first(st_b, frc_b, grid_b, w1, w2)
    for _ in range(nsteps - 1):
        s = step_rest(s, frc_b, grid_b, w1, w2)
    return from_blocked(s, mesh, cfg.halo)


def _compare(s1, sd, fields=("zeta", "ubar", "vbar", "u", "v", "t", "hz"),
             atol=1e-12):
    for name in fields:
        a = np.asarray(getattr(s1, name))[..., H:-H, H:-H]
        b = np.asarray(getattr(sd, name))[..., H:-H, H:-H]
        scale = max(1.0, np.abs(a).max())
        np.testing.assert_allclose(b, a, atol=atol * scale, rtol=0,
                                   err_msg=f"field {name}")


def test_halo_exchange_matches_periodic_fill():
    """HaloExchange on the mesh == periodic_fill on the assembled array
    (reference: src/mpi_test.F halo-exchange exerciser)."""
    from functools import partial

    from jax.sharding import PartitionSpec as P
    from roms_tpu.parallel.halo import HaloExchange

    mesh = make_mesh(8)
    py, px = mesh.devices.shape
    ny, nx = 8 * py, 8 * px
    rng = np.random.default_rng(0)
    glob = rng.normal(size=(ny + 2 * H, nx + 2 * H))
    glob = np.asarray(periodic_fill(jnp.asarray(glob), H))

    class Holder:
        pass

    tree = {"field": jnp.asarray(glob)}
    blocked = to_blocked(tree, mesh, H)

    ex = HaloExchange(h=H)

    def f(t):
        # trash the ghosts, then refresh them by exchange
        a = t["field"]
        a = a.at[..., :H, :].set(-9e9).at[..., -H:, :].set(-9e9)
        a = a.at[..., :, :H].set(-9e9).at[..., :, -H:].set(-9e9)
        return {"field": ex(a)}

    out = jax.jit(jax.shard_map(
        f, mesh=mesh, in_specs=({"field": P("y", "x")},),
        out_specs={"field": P("y", "x")}))(blocked)
    back = from_blocked(out, mesh, H)["field"]
    np.testing.assert_array_equal(back[H:-H, H:-H], glob[H:-H, H:-H])
    # ghost rings of edge blocks came over the wrap links
    np.testing.assert_array_equal(back, glob)


def test_filament_periodic_8dev():
    """Fully periodic Filament core: 1 block vs 8 devices, 5 steps."""
    from roms_tpu.cases import filament

    cfg = filament.config().replace(nx=64, ny=64, nz=16, ndtfast=30)
    grid, st, frc = filament.setup(cfg)
    s1 = _run_single(cfg, grid, st, frc, 5)
    sd = _run_dist(cfg, grid, st, frc, 5, make_mesh(8))
    _compare(s1, sd)


def test_obc_basin_radiating_8dev():
    """All-open Flather/Orlanski basin (non-periodic): the BC kernels must
    apply only on edge-owning blocks."""
    from roms_tpu.cases import obc_basin

    cfg = obc_basin.config("radiating")
    grid, st, frc = obc_basin.setup(cfg)
    s1 = _run_single(cfg, grid, st, frc, 5)
    sd = _run_dist(cfg, grid, st, frc, 5, make_mesh(8))
    _compare(s1, sd)


def test_rivers_masked_kpp_8dev():
    """Rivers_ana: land mask + river point sources + nonlinear EOS + KPP,
    closed basin — the full physics stack under the mesh."""
    from roms_tpu.cases import rivers_ana

    cfg = rivers_ana.config()
    grid, st, frc = rivers_ana.setup(cfg)
    s1 = _run_single(cfg, grid, st, frc, 5)
    sd = _run_dist(cfg, grid, st, frc, 5, make_mesh(8))
    _compare(s1, sd)


def test_distributed_diag_matches_single():
    """Deterministic distributed diagnostics: the mesh reduction must agree
    with the single-block diag (reference: diag.F rank-count independence),
    and blowup monitoring must run under the mesh (run_distributed)."""
    from roms_tpu.cases import rivers_ana
    from roms_tpu.driver import run, run_distributed

    cfg = rivers_ana.config(ntimes=3)
    grid, st, frc = rivers_ana.setup(cfg)
    _, rows1 = run(grid, st, frc, cfg, nsteps=3)
    _, rows8 = run_distributed(grid, st, frc, cfg, make_mesh(8), nsteps=3)
    # energies: same quantities reduced in a different (fixed) tree order
    np.testing.assert_allclose(rows8[:, 1:3], rows1[:, 1:3],
                               rtol=1e-13, atol=1e-300)
    # CFL maxima are order-independent picks
    np.testing.assert_allclose(rows8[:, 3:], rows1[:, 3:], rtol=1e-12)
