"""zslice + extraction output tests (reference: src/zslice_output.F,
src/extract_data.F)."""

import numpy as np
import jax.numpy as jnp

from roms_tpu.cases import filament
from roms_tpu.io import open_dataset
from roms_tpu.io.extract import (ExtractObject, ExtractWriter,
                                 extract_points, extract_uv)
from roms_tpu.io.zslice import ZsliceWriter, zslice


def _case():
    cfg = filament.config(ntimes=1).replace(nx=16, ny=12, nz=8)
    grid, st, forcing = filament.setup(cfg)
    return cfg, grid, st


def test_zslice_linear_field():
    cfg, grid, st = _case()
    # field = z -> slicing at depth d must return d
    f = st.z_r
    out = np.asarray(zslice(f, st.z_r, jnp.asarray([-10.0, -50.0, -500.0])))
    h = cfg.halo
    intr = (slice(h, -h), slice(h, -h))
    np.testing.assert_allclose(out[0][intr], -10.0, rtol=1e-12)
    np.testing.assert_allclose(out[1][intr], -50.0, rtol=1e-12)
    np.testing.assert_allclose(out[2][intr], -500.0, rtol=1e-12)
    # below the bottom (h=1000): NaN
    out2 = np.asarray(zslice(f, st.z_r, jnp.asarray([-2000.0])))
    assert np.isnan(out2[0][intr]).all()


def test_zslice_writer(tmp_path):
    cfg, grid, st = _case()
    p = str(tmp_path / "z.nc")
    zw = ZsliceWriter(p, grid, cfg, depths=[10.0, 100.0],
                      varnames=["temp", "rho"])
    zw.write(st)
    zw.close()
    with open_dataset(p) as ds:
        assert ds["temp"].shape == (1, 2, cfg.ny + 2, cfg.nx + 2)
        v = ds["temp"][0, 0]
        assert np.isfinite(v[2:-2, 2:-2]).all()


def test_extract_points_bilinear():
    cfg, grid, st = _case()
    # extracting the x-coordinate field at fractional points is exact
    xr = grid.xr
    px = jnp.asarray([3.25, 7.5])
    py = jnp.asarray([4.0, 6.75])
    vals = np.asarray(extract_points(xr, px, py, cfg))
    dx = 1.0 / float(np.asarray(grid.pm)[3, 3])
    x0 = float(np.asarray(xr)[3, 1])  # Fortran i=0
    np.testing.assert_allclose(vals[0], x0 + 3.25 * dx, rtol=1e-12)
    np.testing.assert_allclose(vals[1], x0 + 7.5 * dx, rtol=1e-12)


def test_extract_uv_rotation():
    cfg, grid, st = _case()
    u = jnp.ones_like(st.u)
    v = jnp.zeros_like(st.v)
    ang = jnp.full_like(grid.h, np.pi / 2)  # grid rotated 90 deg
    ue, vn = extract_uv(u, v, [5.0], [5.0], grid, cfg, angler=ang)
    np.testing.assert_allclose(np.asarray(ue)[..., 0][..., None],
                               np.zeros((cfg.nz, 1)), atol=1e-12)
    np.testing.assert_allclose(np.asarray(vn), 1.0, atol=1e-12)


def test_extract_writer(tmp_path):
    cfg, grid, st = _case()
    ob = ExtractObject("moor", [4.0, 8.0], [6.0, 6.0])
    p = str(tmp_path / "ext.nc")
    ew = ExtractWriter(p, [ob], cfg, varnames=("zeta", "temp", "u", "v"))
    ew.write(st, grid)
    ew.close()
    with open_dataset(p) as ds:
        assert ds["moor_zeta"].shape == (1, 2)
        assert ds["moor_temp"].shape == (1, cfg.nz, 2)
        assert np.isfinite(ds["moor_u"][...]).all()
