"""Distributed (shard_map) equivalence: the block-halo distributed step on
an 8-virtual-device 2D mesh must reproduce the single-block step to
round-off, for periodic, open-boundary, and masked/river configurations.

This is the analog of the reference's requirement that results be
independent of the rank decomposition (reference: src/mpi_exchanges.F,
tests run on 3x2 ranks vs the same physics on 1 rank), plus a unit test of
the halo-exchange primitive itself (reference: src/mpi_test.F).
"""

import os

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
    from roms_tpu.parallel.dist import pad_for_mesh
    w1, w2, _ = set_weights(cfg.ndtfast)
    w1 = jnp.asarray(w1, jnp.float64)
    w2 = jnp.asarray(w2, jnp.float64)
    cfg_p = pad_for_mesh(cfg, mesh)
    pads = (cfg_p.pad_n, cfg_p.pad_e)
    st_b = to_blocked(st, mesh, cfg.halo, pads=pads)
    frc_b = to_blocked(frc, mesh, cfg.halo, pads=pads)
    grid_b = to_blocked(grid, mesh, cfg.halo, pads=pads)
    step_first, step_rest = make_distributed_step(cfg, mesh)
    s = step_first(st_b, frc_b, grid_b, w1, w2)
    for _ in range(nsteps - 1):
        s = step_rest(s, frc_b, grid_b, w1, w2)
    return from_blocked(s, mesh, cfg.halo, pads=pads)


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


def test_canonical_pairwise_sum_count_independent():
    """The canonical-block pairwise reduction must be BITWISE independent
    of how the field is sharded (reference: diag.F:14 SUM_BY_PAIRS +
    :434-470 — sums independent of rank count)."""
    from roms_tpu.diag import NB_SUM, _block_sums, _pairwise_last

    rng = np.random.default_rng(7)
    f = jnp.asarray(rng.standard_normal((64, 64)) * 1e3, jnp.float64)
    full_blocks = _block_sums(f, NB_SUM, NB_SUM)
    ref = float(_pairwise_last(full_blocks.reshape(1, -1))[0])

    for my, mx in ((1, 1), (2, 4), (4, 2), (2, 2), (8, 1), (1, 8), (8, 8)):
        nyl, nxl = 64 // my, 64 // mx
        g = np.zeros((NB_SUM, NB_SUM))
        for iy in range(my):
            for ix in range(mx):
                shard = f[iy * nyl:(iy + 1) * nyl, ix * nxl:(ix + 1) * nxl]
                loc = _block_sums(shard, NB_SUM // my, NB_SUM // mx)
                g[iy * (NB_SUM // my):(iy + 1) * (NB_SUM // my),
                  ix * (NB_SUM // mx):(ix + 1) * (NB_SUM // mx)] = loc
        got = float(_pairwise_last(jnp.asarray(g).reshape(1, -1))[0])
        assert got == ref, (my, mx, got - ref)


def test_distributed_diag_bitwise_on_canonical_grid():
    """On a canonical grid (interior dims and mesh axes divide 8), the
    distributed diag reduction must match the single-device one BITWISE
    for the same state — enabling exact-match distributed regression
    (reference: diag.F rank-count-independent sums make the exact-equality
    checker of tests/scripts/test_roms.py possible on any rank layout).

    The same state is fed to both paths: stepping itself is only
    reproducible to the ulp across differently-compiled XLA programs
    (fusion/FMA choices differ between the shard_map and single-device
    executables), which the trajectory tests above cover at 1e-12."""
    from roms_tpu.cases import filament
    from roms_tpu.diag import compute_diag, make_distributed_diag

    cfg = filament.config()
    grid, st, frc = filament.setup(cfg)
    w1, w2, _ = set_weights(cfg.ndtfast)
    st = step(st, frc, grid, jnp.asarray(w1, jnp.float64),
              jnp.asarray(w2, jnp.float64), cfg, first_step=True)
    d1 = compute_diag(st, grid, cfg)

    mesh = make_mesh(8)
    st_b = to_blocked(st, mesh, cfg.halo)
    grid_b = to_blocked(grid, mesh, cfg.halo)
    d8 = make_distributed_diag(cfg, mesh)(st_b, grid_b)
    # The canonical pairwise reduction is EXACTLY count-independent (see
    # test_canonical_pairwise_sum_count_independent).  End-to-end the two
    # executables may still differ by 1 ulp in the per-point diagnostic
    # FIELDS (XLA vectorization/contraction differs between the plain and
    # shard_map programs — not a summation-order effect), so the bound
    # here is 2 ulp, vs ~1e-13 relative for the old fixed-order combine.
    for name in ("avke", "avke2b", "avpe", "avzeta", "cu_adv", "cu_w",
                 "v2d_max"):
        a = float(getattr(d1, name))
        b = float(getattr(d8, name))
        assert abs(b - a) <= 2 * np.spacing(abs(a)), (name, a, b)


def test_nondivisible_grid_pads_onto_mesh():
    """Arbitrary (non-mesh-divisible) grids shard via inert padding — the
    reverse of the reference's edge-rank remainder absorption (reference:
    src/mpi_setup.F:115-155).  A 67x45 masked all-open-boundary basin with
    an island must reproduce the single-block trajectory to round-off on a
    2x4 mesh (pads: pad_e=1, pad_n=1)."""
    from roms_tpu.cases import obc_basin
    from roms_tpu.parallel.dist import pad_for_mesh

    cfg = obc_basin.config("radiating").replace(nx=67, ny=45, nz=8,
                                                ndtfast=12)
    grid, st, frc = obc_basin.setup(cfg, land_blob=True)
    mesh = make_mesh(8)
    cfg_p = pad_for_mesh(cfg, mesh)
    assert (cfg_p.pad_n, cfg_p.pad_e) == (1, 1)
    s1 = _run_single(cfg, grid, st, frc, 5)
    sd = _run_dist(cfg, grid, st, frc, 5, mesh)
    assert np.asarray(sd.zeta).shape == np.asarray(s1.zeta).shape
    _compare(s1, sd)


def test_distributed_budgets_and_upscale_assemble():
    """Budgets and upscale strips must be fully available under the mesh
    (round-2 review: they were silently stripped) and match the
    single-block values (reference: diagnostics.F and upscale_output.F
    run on every rank)."""
    from roms_tpu.cases import obc_basin
    from roms_tpu.driver import run, run_distributed

    cfg = obc_basin.config("inflow", ntimes=3).replace(
        nx=16, ny=16, nz=6, dt=60.0, ndtfast=20,
        tracer_diagnostics=True, uv_diagnostics=True, upscale_output=True)
    grid, st, frc = obc_basin.setup(cfg, inflow_u=0.1, t_inflow=2.0)
    s1, _ = run(grid, st, frc, cfg, nsteps=3)
    sd, _ = run_distributed(grid, st, frc, cfg, make_mesh(8), nsteps=3)

    for k in ("hadv", "vadv", "forc", "vmix", "rate"):
        a = np.asarray(s1.t_budget[k])[..., H:-H, H:-H]
        b = np.asarray(sd.t_budget[k])[..., H:-H, H:-H]
        scale = max(1.0, np.abs(a).max())
        np.testing.assert_allclose(b, a, atol=1e-12 * scale, rtol=0,
                                   err_msg=f"t_budget[{k}]")
    # momentum budgets are recorded on the reference's update range
    # istrU..iend / jstrV..jend (reference: diagnostics.F loops): the first
    # staggered column/row is a BOUNDARY point whose interior-formula value
    # is overwritten by the BCs, so its budget entry is not meaningful
    sl_u = (Ellipsis, slice(H, -H), slice(H + 1, -H))
    sl_v = (Ellipsis, slice(H + 1, -H), slice(H, -H))
    for comp, sl in (("u", sl_u), ("v", sl_v)):
        for k in ("pgr", "cori", "adv", "hmix", "vmix", "coup", "rate"):
            a = np.asarray(s1.uv_budget[comp][k])[sl]
            b = np.asarray(sd.uv_budget[comp][k])[sl]
            scale = max(1.0, np.abs(a).max())
            np.testing.assert_allclose(b, a, atol=1e-12 * scale, rtol=0,
                                       err_msg=f"uv_budget[{comp}][{k}]")
    assert set(sd.upscale.keys()) == set(s1.upscale.keys()) == {"west",
                                                                "east"}
    for e in ("west", "east"):
        a = np.asarray(s1.upscale[e])[..., H:-H]
        b = np.asarray(sd.upscale[e])[..., H:-H]
        scale = max(1.0, np.abs(a).max())
        np.testing.assert_allclose(b, a, atol=1e-12 * scale, rtol=0,
                                   err_msg=f"upscale[{e}]")


@pytest.mark.parametrize("dims", [(67, 45), (99, 51)])
def test_distributed_diag_bitwise_on_any_grid(dims):
    """Universal count-independence: the distributed diag reassembles the
    global interior and runs the SAME canonical zero-padded pairwise sum
    as the single-device path, so sums agree to the ulp on grids that do
    NOT divide the canonical 8x8 blocks — the USWC real-data shapes
    (199x99-like) especially (reference: diag.F:14,434-470 guarantees the
    sums for ANY rank count and grid)."""
    from roms_tpu.cases import obc_basin
    from roms_tpu.diag import compute_diag, make_distributed_diag
    from roms_tpu.parallel.dist import pad_for_mesh

    nx, ny = dims
    cfg = obc_basin.config("radiating").replace(nx=nx, ny=ny, nz=6,
                                                ndtfast=12)
    grid, st, frc = obc_basin.setup(cfg, land_blob=True)
    w1, w2, _ = set_weights(cfg.ndtfast)
    st = step(st, frc, grid, jnp.asarray(w1, jnp.float64),
              jnp.asarray(w2, jnp.float64), cfg, first_step=True)
    d1 = compute_diag(st, grid, cfg)

    mesh = make_mesh(8)
    cfg_p = pad_for_mesh(cfg, mesh)
    pads = (cfg_p.pad_n, cfg_p.pad_e)
    st_b = to_blocked(st, mesh, cfg.halo, pads=pads)
    grid_b = to_blocked(grid, mesh, cfg.halo, pads=pads)
    d8 = make_distributed_diag(cfg_p, mesh)(st_b, grid_b)
    for name in ("avke", "avke2b", "avpe", "avzeta", "cu_adv", "cu_w",
                 "v2d_max"):
        a = float(getattr(d1, name))
        b = float(getattr(d8, name))
        assert abs(b - a) <= 2 * np.spacing(abs(a)), (name, a, b)


def test_multihost_mesh_layout():
    """The DCN boundary aligns with one mesh axis: hosts are stacked
    along `dcn_axis`, each host's chips contiguous along the other, so
    halo traffic crosses DCN only at the one inter-host shard boundary
    (reference: the MPI world spanning hosts, src/main.F:26-28;
    SURVEY 2.2 item 5)."""
    import dataclasses

    from roms_tpu.parallel.dist import _multihost_mesh

    @dataclasses.dataclass(frozen=True)
    class FakeDev:
        process_index: int
        id: int

    devs = [FakeDev(p, p * 4 + i) for p in range(2) for i in range(4)]
    mesh = _multihost_mesh(devs, nproc=2, dcn_axis="y")
    assert mesh.devices.shape == (2, 4)
    # row 0 = host 0's chips, row 1 = host 1's chips
    assert all(d.process_index == 0 for d in mesh.devices[0])
    assert all(d.process_index == 1 for d in mesh.devices[1])
    mesh_x = _multihost_mesh(devs, nproc=2, dcn_axis="x")
    assert mesh_x.devices.shape == (4, 2)
    assert all(d.process_index == 0 for d in mesh_x.devices[:, 0])
    assert all(d.process_index == 1 for d in mesh_x.devices[:, 1])


def test_init_multihost_single_process_smoke():
    """`init_multihost(num_processes=1)` executes end-to-end (the
    jax.distributed runtime mutates global state, so run it in a clean
    subprocess) and returns the full single-host mesh."""
    import subprocess
    import sys

    code = (
        # sitecustomize may pre-import jax with an accelerator platform;
        # force CPU + 8 virtual devices the same way conftest.py does
        "import os; os.environ['JAX_PLATFORMS']='cpu';"
        "os.environ['XLA_FLAGS']="
        "'--xla_force_host_platform_device_count=8';"
        "import jax;"
        "jax.config.update('jax_platforms', 'cpu');"
        "jax.config.update('jax_num_cpu_devices', 8);"
        "import sys; sys.path.insert(0, %r);"
        "from roms_tpu.parallel.dist import init_multihost;"
        "m = init_multihost(num_processes=1);"
        "assert m.devices.size == 8, m.devices.shape;"
        "assert m.axis_names == ('y', 'x');"
        "print('MULTIHOST_OK', m.devices.shape)"
    ) % os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run([sys.executable, "-c", code],
                         capture_output=True, text=True, timeout=300)
    assert "MULTIHOST_OK" in out.stdout, (out.stdout, out.stderr)


def test_forcing_fn_receives_surface_state_view():
    """A 3-arg set_forces hook (bulk forcing shape: reads the model SST and
    surface currents) must receive a live surface-state view under
    run_distributed — round-4 advisor finding: it received None and
    crashed with AttributeError at the first step (reference: bulk_frc.F
    consumes t(:,:,N,nrhs,itemp) + surface u,v on every rank every step)."""
    from roms_tpu.cases import obc_basin
    from roms_tpu.driver import run, run_distributed

    cfg = obc_basin.config("inflow", ntimes=3).replace(
        nx=16, ny=16, nz=6, dt=60.0, ndtfast=20)
    grid, st, frc = obc_basin.setup(cfg, inflow_u=0.1, t_inflow=2.0)

    seen = {"none": 0}

    def forcing_fn(t, base, state):
        # SST-dependent heat flux: the distributed and single-device runs
        # only agree if the distributed hook sees the same live surface.
        if state is None:
            seen["none"] += 1
            return base
        sst = np.asarray(state.t[cfg.itemp, -1])
        stflx = base.stflx.at[cfg.itemp].set(
            jnp.asarray(1e-4 * (20.0 - sst), base.stflx.dtype))
        return base.replace(stflx=stflx)

    s1, _ = run(grid, st, frc, cfg, nsteps=3, forcing_fn=forcing_fn)
    sd, _ = run_distributed(grid, st, frc, cfg, make_mesh(8), nsteps=3,
                            forcing_fn=forcing_fn)
    assert seen["none"] == 0, "distributed hook was passed state=None"
    for name in ("zeta", "t", "u", "v"):
        a = np.asarray(getattr(s1, name))[..., H:-H, H:-H]
        b = np.asarray(getattr(sd, name))[..., H:-H, H:-H]
        scale = max(1.0, np.abs(a).max())
        np.testing.assert_allclose(b, a, atol=1e-11 * scale, rtol=0,
                                   err_msg=name)
