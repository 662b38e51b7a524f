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


def test_dated_filenames_and_rotation(tmp_path):
    """Date-stamped file names + nrpf rotation (reference:
    roms_read_write.F:1389-1447 append_date_node, basic_output.F nrpf)."""
    from roms_tpu.cases import obc_basin
    from roms_tpu.driver import run
    from roms_tpu.io.output import (RotatingHistoryWriter, dated_filename,
                                    sec2date)

    assert sec2date(0.0) == (2000, 1, 1, 0, 0, 0)
    assert dated_filename("r", "his", 0.0) == "r.his.20000101000000.nc"
    assert dated_filename("r", "his", 86400.0 + 3661.0, dt_format=3) \
        == "r.his.200001020101.nc"
    assert dated_filename("r", "his", 1800.0, dt_format=4) \
        == "r.his.00002.nc"

    cfg = obc_basin.config("closed", ntimes=4).replace(nx=12, ny=10, nz=6,
                                                       dt=60.0, ndtfast=10)
    grid, st, frc = obc_basin.setup(cfg)
    rw = RotatingHistoryWriter(str(tmp_path / "rot"), grid, cfg, nrpf=2)
    _, _ = run(grid, st, frc, cfg, step_hook=lambda s, i: rw.write(s))
    rw.close()
    assert len(rw.files) == 2          # 4 records / nrpf=2
    import os
    assert all(os.path.exists(p) for p in rw.files)


def test_frc_and_random_writers(tmp_path):
    from roms_tpu.cases import obc_basin
    from roms_tpu.driver import run
    from roms_tpu.io.netcdf import open_dataset
    from roms_tpu.io.output import FrcWriter, RandomWriter
    import jax.numpy as jnp

    cfg = obc_basin.config("closed", ntimes=2).replace(nx=12, ny=10, nz=6,
                                                       dt=60.0, ndtfast=10)
    grid, st, frc = obc_basin.setup(cfg)
    frc = frc.replace(sustr=jnp.full_like(frc.sustr, 1e-4))
    fp = str(tmp_path / "frc.nc")
    rp = str(tmp_path / "rnd.nc")
    fw = FrcWriter(fp, cfg, navg=2)
    rw = RandomWriter(rp, grid, cfg, ["zeta", "u"])

    def hook(s, i):
        fw.accumulate(frc, float(s.time))
        rw.write(s)

    run(grid, st, frc, cfg, step_hook=hook)
    fw.close()
    rw.close()
    with open_dataset(fp) as ds:
        su = ds["sustr"][...]
        assert su.shape == (1, cfg.ny + 2, cfg.nx + 2)
        np.testing.assert_allclose(su, 1e-4, rtol=1e-6)
    with open_dataset(rp) as ds:
        assert ds["u"].shape == (2, cfg.nz, cfg.ny + 2, cfg.nx + 2)
        assert np.isfinite(ds["zeta"][...]).all()


def test_tracer_metadata_table(tmp_path):
    """Per-tracer output metadata + wrt flags (reference:
    src/tracers.opt:36-67): names/units land in the file, wrt=False
    drops a tracer, and BGC tracers get their model names."""
    import numpy as np

    from roms_tpu.cases import obc_basin
    from roms_tpu.io.netcdf import open_dataset
    from roms_tpu.io.output import HistoryWriter, TracerMeta, tracer_table

    cfg = obc_basin.config("closed", ntimes=1).replace(
        nx=8, ny=8, nz=4, nt=3, salinity=True)
    grid, st, frc = obc_basin.setup(cfg)
    rows = tracer_table(cfg)
    assert rows[0].name == "temp" and rows[0].units == "Celsius"
    assert rows[1].name == "salt"
    rows[2:] = [TracerMeta(name="dye", long_name="dye tracer",
                           units="kg meter-3", wrt=True)]
    rows[1] = TracerMeta(name="salt", wrt=False)     # drop salinity
    p = str(tmp_path / "his_meta.nc")
    hw = HistoryWriter(p, grid, cfg, tracers=rows)
    hw.write(st)
    hw.close()
    with open_dataset(p) as ds:
        assert "dye" in ds.variables and "temp" in ds.variables
        assert "salt" not in ds.variables
        assert ds["temp"].attrs.get("units") == "Celsius"
        assert np.isfinite(ds["dye"][...]).all()

    # BGC names come from the registered model
    cfg_b = cfg.replace(nt=2 + 29, bgc_model="bec2", n_bgc=29)
    names = [t.name for t in tracer_table(cfg_b)]
    assert "DIC" in names and "Alk" in names and "O2" in names
