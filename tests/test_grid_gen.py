"""Grid generation tool checks (reference: the MATLAB/roms-tools
pre-processing step producing grid files for src/grid.F get_grid;
stiffness definitions src/grid_stiffness.F; mask cleanup
Tools-Roms/etch_into_land.F)."""

import numpy as np
import pytest

from roms_tpu.tools.grid_gen import (generate_grid, make_lonlat_grid,
                                     prune_isolated_wet, rx0_of,
                                     smooth_topo_log, spherical_metrics,
                                     write_grid)


def test_metrics_uniform_grid():
    """Unrotated 2 km grid at 35N: pm=pn=1/2000 within ~0.2%, f matches
    2*Omega*sin(lat), angle ~ 0."""
    lon, lat = make_lonlat_grid(-122.0, 35.0, 80e3, 60e3, 40, 30)
    pm, pn, f, angle = spherical_metrics(lon, lat)
    assert pm.shape == (32, 42)
    np.testing.assert_allclose(pm, 1.0 / 2000.0, rtol=3e-3)
    np.testing.assert_allclose(pn, 1.0 / 2000.0, rtol=3e-3)
    f_expect = 2.0 * 7.292115e-5 * np.sin(np.deg2rad(lat))
    np.testing.assert_allclose(f, f_expect, rtol=1e-12)
    assert float(np.abs(angle).max()) < 1e-3


def test_rotation_preserves_spacing():
    lon, lat = make_lonlat_grid(-122.0, 35.0, 80e3, 60e3, 40, 30,
                                rotation=30.0)
    pm, pn, _, angle = spherical_metrics(lon, lat)
    np.testing.assert_allclose(pm, 1.0 / 2000.0, rtol=5e-3)
    np.testing.assert_allclose(pn, 1.0 / 2000.0, rtol=5e-3)
    # interior angle ~ rotation (30 deg)
    a_int = angle[5:-5, 5:-5]
    np.testing.assert_allclose(a_int, np.deg2rad(30.0), atol=0.02)


def test_smooth_topo_reaches_target():
    rng = np.random.default_rng(7)
    ny, nx = 40, 50
    h = np.exp(rng.uniform(np.log(20.0), np.log(4000.0), (ny, nx)))
    rmask = np.ones((ny, nx))
    rmask[:5, :5] = 0.0
    assert rx0_of(h, rmask) > 0.2
    hs = smooth_topo_log(h, rmask, rx0_max=0.2)
    assert rx0_of(hs, rmask) <= 0.2 + 1e-12
    # smoothing stays within the original depth range and leaves land
    # values untouched
    assert hs.min() >= h.min() - 1e-9 and hs.max() <= h.max() + 1e-9
    np.testing.assert_array_equal(hs[rmask < 0.5], h[rmask < 0.5])


def test_prune_isolated_wet():
    m = np.zeros((20, 20))
    m[2:18, 2:12] = 1.0          # main basin
    m[5:8, 15:18] = 1.0          # disconnected lake
    out = prune_isolated_wet(m)
    assert out[6, 16] == 0.0
    assert out[10, 5] == 1.0
    assert out.sum() == 16 * 10


def test_generate_and_readback(tmp_path):
    """End-to-end: generated file loads through the model's grid reader
    and builds a runnable Grid with the requested stiffness."""
    import jax.numpy as jnp

    from roms_tpu.config import ModelConfig
    from roms_tpu.io.input import read_grid

    nx, ny = 24, 16

    def bathy(lon, lat):
        # shelf-to-deep with a land strip on the east
        x = (lon - lon.min()) / (lon.max() - lon.min())
        return np.where(x < 0.85, 50.0 + 3500.0 * x, -10.0)

    path = str(tmp_path / "grid.nc")
    out = generate_grid(-122.0, 35.0, 48e3, 32e3, nx, ny, bathy,
                        hmin=25.0, rx0_max=0.2, path=path)
    assert rx0_of(out["h"], out["mask_rho"]) <= 0.2 + 1e-12

    cfg = ModelConfig(nx=nx, ny=ny, nz=8, nt=2, dt=60.0, ndtfast=20,
                      ntimes=1, masking=True,
                      ew_periodic=False, ns_periodic=False)
    grid = read_grid(path, cfg, dtype=jnp.float64)
    assert grid.h.shape == (ny + 4, nx + 4)
    assert bool(jnp.all(jnp.isfinite(grid.h)))
    # land strip survived the round trip
    assert float(grid.rmask[:, -3].max()) == 0.0 or \
        float(np.asarray(grid.rmask)[2:-2, -3].max()) == 0.0


def test_cli(tmp_path, capsys):
    from roms_tpu.tools.grid_gen import main
    path = str(tmp_path / "g.nc")
    main([path, "--center", "-122", "35", "--size-km", "40", "30",
          "--shape", "16", "12", "--flat-depth", "800"])
    out = capsys.readouterr().out
    assert "wrote" in out and "16x12 interior" in out
    import os
    assert os.path.exists(path)
