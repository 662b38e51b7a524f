"""Non-hydrostatic pressure projection tests (reference:
NHMG/tests/mg_testseamount.f90 — seamount geometry, project an arbitrary
velocity field to non-divergence; solver NHMG/src/mg_solvers.f90)."""

import jax.numpy as jnp
import numpy as np
import types

from roms_tpu import nhmg
from roms_tpu.config import ModelConfig


def _seamount(nx=32, ny=32, nz=16, dtype=jnp.float64):
    """The NHMG seamount analog: Lx=Ly=10 km, H=4 km Gaussian seamount
    (mg_testseamount.f90 geometry at reduced resolution)."""
    cfg = ModelConfig(nx=nx, ny=ny, nz=nz, nt=1, masking=False,
                      ew_periodic=False, ns_periodic=False)
    jy, ix = ny + 4, nx + 4
    L = 1.0e4
    dx = L / nx
    x = dx * (np.arange(ix) - 1.5)[None, :]
    y = dx * (np.arange(jy) - 1.5)[:, None]
    h = 4000.0 - 2500.0 * np.exp(-((x - L / 2) ** 2 + (y - L / 2) ** 2)
                                 / (L / 5) ** 2)
    # uniform sigma layers following the bottom (k=0 floor, k=nz surface)
    s_w = np.linspace(-1.0, 0.0, nz + 1)
    zw = jnp.asarray(h[None] * s_w[:, None, None], dtype)   # ascending
    hz = zw[1:] - zw[:-1]
    z_r = 0.5 * (zw[1:] + zw[:-1])
    pm = jnp.full((jy, ix), 1.0 / dx, dtype)
    pn = jnp.full((jy, ix), 1.0 / dx, dtype)
    grid = types.SimpleNamespace(umask=None, vmask=None)
    return cfg, grid, jnp.asarray(hz), jnp.asarray(z_r), pm, pn, dx


def test_seamount_projection_converges():
    """PCG reduces the divergence of a smooth trial flow by >=6 orders of
    magnitude and the corrected field is discretely non-divergent."""
    cfg, grid, hz, z_r, pm, pn, dx = _seamount()
    nz, jy, ix = hz.shape
    rng = np.random.default_rng(3)
    kx = 2 * np.pi / (ix * dx)
    x = dx * np.arange(ix)[None, None, :]
    y = dx * np.arange(jy)[None, :, None]
    zf = np.linspace(0, 1, nz)[:, None, None]
    u = jnp.asarray(0.1 * np.sin(3 * kx * x) * np.cos(2 * kx * y)
                    * (1 + zf), jnp.float64) * jnp.ones_like(hz)
    v = jnp.asarray(0.1 * np.cos(2 * kx * x) * np.sin(3 * kx * y)
                    * (1 - 0.5 * zf), jnp.float64) * jnp.ones_like(hz)
    w = jnp.zeros((nz + 1, jy, ix), jnp.float64)

    res = nhmg.nh_solve(u, v, w, hz, z_r, pm, pn, grid, cfg, n_iter=160)
    assert float(res.res0) > 0.0
    # solver convergence (reference criterion: residual drop, mg_solvers)
    assert float(res.res) < 1e-6 * float(res.res0), (
        float(res.res), float(res.res0))
    # the corrected flow is discretely non-divergent to the same level
    div_c = nhmg.divergence(res.u, res.v, res.w, hz, pm, pn, cfg,
                            z_r=z_r)
    assert float(jnp.abs(div_c).max()) < 1e-6 * float(res.res0)


def test_projection_leaves_divfree_flow_alone():
    """A field that is already non-divergent has b=0: the projection is
    (numerically) the identity."""
    cfg, grid, hz, z_r, pm, pn, dx = _seamount(nx=16, ny=16, nz=8)
    nz, jy, ix = hz.shape
    u = jnp.zeros_like(hz)
    v = jnp.zeros_like(hz)
    w = jnp.zeros((nz + 1, jy, ix), jnp.float64)
    res = nhmg.nh_solve(u, v, w, hz, z_r, pm, pn, grid, cfg, n_iter=10)
    assert float(jnp.abs(res.u).max()) == 0.0
    assert float(jnp.abs(res.w).max()) == 0.0


def test_nh_flag_off_by_default():
    cfg = ModelConfig(nx=8, ny=8, nz=4, nt=1)
    assert cfg.non_hydrostatic is False


def test_nh_flag_in_full_step():
    """Flag-on smoke: the projection runs inside the real step and keeps
    the flow finite; flag-off is the identical default path."""
    from roms_tpu.cases import obc_basin
    from roms_tpu.driver import run

    cfg = obc_basin.config("closed", ntimes=2).replace(
        nx=16, ny=16, nz=6, ndtfast=10, non_hydrostatic=True, nh_iters=20)
    grid, st, frc = obc_basin.setup(cfg)
    st2, _ = run(grid, st, frc, cfg, nsteps=2, collect_diag=False)
    assert bool(jnp.isfinite(st2.u).all())
    assert bool(jnp.isfinite(st2.zeta).all())


def test_sigma_cross_terms_flat_reduces_to_orthogonal():
    """At zero slope the full-matrix operator must equal the orthogonal
    one bit-for-bit (reference: mg_define_matrices.f90 reduces likewise
    for level coordinates)."""
    cfg, grid, hz, z_r, pm, pn, dx = _seamount()
    # flatten the bottom: uniform layers
    nz, jy, ix = hz.shape
    hzf = jnp.full_like(hz, 100.0)
    zwf = jnp.cumsum(hzf, axis=0) - nz * 100.0
    zrf = zwf - 50.0
    rng = np.random.default_rng(11)
    u = jnp.asarray(0.05 * rng.standard_normal(hz.shape))
    v = jnp.asarray(0.05 * rng.standard_normal(hz.shape))
    w = jnp.zeros((nz + 1, jy, ix), jnp.float64)
    r_on = nhmg.nh_solve(u, v, w, hzf, zrf, pm, pn, grid,
                         cfg.replace(nh_sigma_terms=True), n_iter=80)
    r_off = nhmg.nh_solve(u, v, w, hzf, zrf, pm, pn, grid,
                          cfg.replace(nh_sigma_terms=False), n_iter=80)
    np.testing.assert_array_equal(np.asarray(r_on.u), np.asarray(r_off.u))
    np.testing.assert_array_equal(np.asarray(r_on.w), np.asarray(r_off.w))


def test_sigma_cross_terms_tilted_divergence_vanishes():
    """On the steep seamount the full operator's corrected field must
    have vanishing TILTED-face divergence — the quantity the orthogonal
    approximation cannot zero (reference: the full matrices exist for
    exactly this, NHMG/src/mg_define_matrices.f90)."""
    cfg, grid, hz, z_r, pm, pn, dx = _seamount()
    nz, jy, ix = hz.shape
    rng = np.random.default_rng(7)
    u = jnp.asarray(0.1 * rng.standard_normal(hz.shape))
    v = jnp.asarray(0.1 * rng.standard_normal(hz.shape))
    w = jnp.zeros((nz + 1, jy, ix), jnp.float64)

    res = nhmg.nh_solve(u, v, w, hz, z_r, pm, pn, grid,
                        cfg.replace(nh_sigma_terms=True), n_iter=300)
    div_t = nhmg.divergence(res.u, res.v, res.w, hz, pm, pn,
                            cfg.replace(nh_sigma_terms=True), z_r=z_r)
    assert float(jnp.abs(div_t).max()) < 1e-6 * float(res.res0)

    # the orthogonal solve does NOT zero the tilted divergence here
    res_o = nhmg.nh_solve(u, v, w, hz, z_r, pm, pn, grid,
                          cfg.replace(nh_sigma_terms=False), n_iter=300)
    div_o = nhmg.divergence(res_o.u, res_o.v, res_o.w, hz, pm, pn,
                            cfg.replace(nh_sigma_terms=True), z_r=z_r)
    assert float(jnp.abs(div_o).max()) > 1e-3 * float(res.res0)
