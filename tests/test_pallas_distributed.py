"""The Pallas kernels on the DISTRIBUTED path: inside shard_map every
block is a single padded array and the kernels apply physical-edge fixes
gated on the block's ownership flags.  These tests run the full
production-shaped physics (nonlinear split EOS + KPP + salinity + passive
tracers + masking + 4-side OBC) on the 8-virtual-device mesh with every
Pallas kernel forced on in interpret mode, and require the trajectory to
match the jnp distributed engine to round-off — plus the CDR/pipe
point-source fold on the single-block path (round-4 review items 3:
'the bench headline then describes the multi-chip configuration';
reference hot path: src/step3d_t_ISO.F itrc loop)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from roms_tpu.ops import pallas_kpp, pallas_solve, pallas_tracer
from roms_tpu.ops.weights import set_weights
from roms_tpu.parallel.dist import (from_blocked, make_distributed_step,
                                    make_mesh, to_blocked)
from roms_tpu.stepper import step

H = 2


def _pallas_on(monkeypatch):
    for m in (pallas_tracer, pallas_kpp, pallas_solve):
        monkeypatch.setattr(m, "_INTERPRET", True)


def _run_dist(cfg, grid, st, frc, nsteps, mesh):
    w1, w2, _ = set_weights(cfg.ndtfast)
    w1 = jnp.asarray(w1, jnp.float64)
    w2 = jnp.asarray(w2, jnp.float64)
    h = cfg.halo
    st_b = to_blocked(st, mesh, h)
    frc_b = to_blocked(frc, mesh, h)
    grid_b = to_blocked(grid, mesh, h)
    s_first, s_rest = make_distributed_step(cfg, mesh)
    out = s_first(st_b, frc_b, grid_b, w1, w2)
    for _ in range(nsteps - 1):
        out = s_rest(out, frc_b, grid_b, w1, w2)
    return from_blocked(out, mesh, h)


def _run_single(cfg, grid, st, frc, nsteps):
    w1, w2, _ = set_weights(cfg.ndtfast)
    w1 = jnp.asarray(w1, jnp.float64)
    w2 = jnp.asarray(w2, jnp.float64)
    s = step(st, frc, grid, w1, w2, cfg, first_step=True)
    for _ in range(nsteps - 1):
        s = step(s, frc, grid, w1, w2, cfg, first_step=False)
    return s


def _compare(a, b, names=("zeta", "t", "u", "v", "akv", "hbls")):
    for name in names:
        x = np.asarray(getattr(a, name))[..., H:-H, H:-H]
        y = np.asarray(getattr(b, name))[..., H:-H, H:-H]
        scale = max(1.0, np.abs(x).max())
        np.testing.assert_allclose(y, x, atol=5e-11 * scale, rtol=0,
                                   err_msg=name)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_distributed_production_physics_pallas_matches_jnp(monkeypatch):
    """Full production physics menu, 8-device mesh, 2 steps: the Pallas
    kernels (tracer stage with fused t3dmix, KPP vmix, momentum solve)
    per-shard must reproduce the jnp distributed engine."""
    from roms_tpu.cases import bench_production

    cfg = bench_production.config(nx=32, ny=32, nz=8, nt=4)
    grid, st, frc = bench_production.setup(cfg, dtype=jnp.float64)
    mesh = make_mesh(8)

    ref = _run_dist(cfg, grid, st, frc, 2, mesh)      # jnp engine
    _pallas_on(monkeypatch)
    got = _run_dist(cfg, grid, st, frc, 2, mesh)      # Pallas per shard
    _compare(ref, got)


@pytest.mark.slow
@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_distributed_pallas_matches_single_block(monkeypatch):
    """Decomposition invariance with the Pallas kernels ON both sides:
    8-device Pallas == single-block Pallas (the reference's rank-count
    independence contract, tests run on 3x2 vs 1 rank)."""
    from roms_tpu.cases import bench_production

    cfg = bench_production.config(nx=32, ny=32, nz=8, nt=4)
    grid, st, frc = bench_production.setup(cfg, dtype=jnp.float64)
    _pallas_on(monkeypatch)
    s1 = _run_single(cfg, grid, st, frc, 2)
    sd = _run_dist(cfg, grid, st, frc, 2, make_mesh(8))
    _compare(s1, sd)


def test_cdr_point_source_fold_matches_jnp(monkeypatch):
    """The corrector's CDR injection folded into t_sec (Pallas path) must
    match the jnp path's apply_cdr_all on the rhs (reference:
    step3d_t_ISO.F:859-902).  The fold divides/multiplies by Hz(n), so
    round-off at the release cells is allowed."""
    from roms_tpu.cases import obc_basin
    from roms_tpu.cdr import CdrForcing

    cfg = obc_basin.config("inflow", ntimes=3).replace(
        nx=16, ny=16, nz=6, nt=3, dt=60.0, ndtfast=20)
    grid, st, frc = obc_basin.setup(cfg, inflow_u=0.1, t_inflow=2.0)
    rng = np.random.default_rng(0)
    nprf, nt, nz = 3, cfg.nt, cfg.nz
    prf = jnp.asarray(rng.random((nprf, nt, nz)))
    prf = prf / jnp.sum(prf, axis=-1, keepdims=True)
    cdr = CdrForcing(
        iloc=jnp.asarray([5, 9, 12]), jloc=jnp.asarray([6, 10, 3]),
        icdr=jnp.asarray([0, 0, 1]), prf=prf,
        flx=jnp.asarray(1e-3 * rng.random((2, nt))))
    frc = frc.replace(cdr=cdr)

    ref = _run_single(cfg, grid, st, frc, 3)
    _pallas_on(monkeypatch)
    got = _run_single(cfg, grid, st, frc, 3)
    _compare(ref, got, names=("zeta", "t", "u", "v"))
