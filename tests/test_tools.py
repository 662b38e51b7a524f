"""partit/ncjoin/nc3to4z tool tests (reference: Tools-Roms/partit.F,
ncjoin.F, nc3to4z.F): split -> join must round-trip exactly."""

import numpy as np

from roms_tpu.io.netcdf import NCWriter, open_dataset
from roms_tpu.tools import ncjoin, nc3to4z, node_blocks, partit


def _make_grid_file(path, llm=19, mmm=11, nz=4):
    w = NCWriter(path, {"title": "toolgrid"})
    w.create_dim("xi_rho", llm + 2)
    w.create_dim("xi_u", llm + 1)
    w.create_dim("eta_rho", mmm + 2)
    w.create_dim("eta_v", mmm + 1)
    w.create_dim("s_rho", nz)
    rng = np.random.default_rng(3)
    fields = {
        "h": (("eta_rho", "xi_rho"), rng.normal(size=(mmm + 2, llm + 2))),
        "u3d": (("s_rho", "eta_rho", "xi_u"),
                rng.normal(size=(nz, mmm + 2, llm + 1))),
        "v3d": (("s_rho", "eta_v", "xi_rho"),
                rng.normal(size=(nz, mmm + 1, llm + 2))),
        "scalar_levels": (("s_rho",), np.arange(nz, dtype=float)),
    }
    for name, (dims, data) in fields.items():
        w.create_var(name, dims, "f8", {"units": "x"})
        w.write(name, data)
    w.close()
    return fields


def test_node_blocks_cover_interior():
    for (npx, npe, llm, mmm) in [(3, 2, 19, 11), (2, 2, 16, 16),
                                 (4, 1, 10, 5)]:
        blocks = node_blocks(npx, npe, llm, mmm)
        cover = np.zeros((mmm, llm), int)
        for in_, jn, i0, i1, j0, j1 in blocks:
            cover[j0:j1, i0:i1] += 1
        assert (cover == 1).all()


def test_partit_ncjoin_roundtrip(tmp_path):
    src = str(tmp_path / "grid.nc")
    fields = _make_grid_file(src)
    names = partit(src, 3, 2)
    assert len(names) == 6

    # per-node files carry the partition attribute
    with open_dataset(names[0]) as ds:
        part = np.asarray(ds.attrs["partition"])
        assert part[0] == 0 and part[1] == 6
        assert ds.attrs["title"] == "toolgrid"

    out = str(tmp_path / "joined.nc")
    ncjoin(names, out)
    with open_dataset(out) as ds:
        for name, (dims, data) in fields.items():
            np.testing.assert_array_equal(ds[name][...], data,
                                          err_msg=name)
        assert ds.attrs["title"] == "toolgrid"


def test_nc3to4z(tmp_path):
    src = str(tmp_path / "g.nc")
    fields = _make_grid_file(src)
    out = str(tmp_path / "g4.nc")
    nc3to4z(src, out)
    with open_dataset(out) as ds:
        np.testing.assert_array_equal(ds["h"][...], fields["h"][1])
        assert ds.attrs["title"] == "toolgrid"


def test_sample_cli(tmp_path):
    """Offline sampling/slicing CLI (reference: Tools-Roms/sample.F +
    zslice.F)."""
    from roms_tpu.cases import obc_basin
    from roms_tpu.driver import run
    from roms_tpu.io.netcdf import open_dataset
    from roms_tpu.io.output import HistoryWriter
    from roms_tpu.tools.sample import main as sample_main

    cfg = obc_basin.config("closed", ntimes=1).replace(nx=12, ny=10, nz=6,
                                                       dt=60.0, ndtfast=10)
    grid, st, frc = obc_basin.setup(cfg)
    hp = str(tmp_path / "his.nc")
    hw = HistoryWriter(hp, grid, cfg)
    st1, _ = run(grid, st, frc, cfg)
    hw.write(st1)
    hw.close()
    out = str(tmp_path / "sl.nc")
    rc = sample_main([hp, "--var", "temp", "--depths", "20", "-o", out])
    assert rc == 0
    with open_dataset(out) as ds:
        v = ds["temp"][...]
        assert v.shape[0] == 1 and np.isfinite(v).any()
    rc = sample_main([hp, "--var", "zeta", "--points", "5.5,5"])
    assert rc == 0


def test_ipslice_cli(tmp_path):
    """Isopycnal slicing (reference: Tools-Roms/zslice.F ipslice mode):
    a linearly-stratified column sliced at a mid-column density value
    recovers the field at that density's depth."""
    import numpy as np

    from roms_tpu.io.netcdf import NCWriter, open_dataset
    from roms_tpu.tools.sample import main as sample_main

    nz, ny, nx = 8, 6, 7
    hp = str(tmp_path / "his.nc")
    zr = np.linspace(-95.0, -5.0, nz)[:, None, None] * np.ones((1, ny, nx))
    rho = 2.0 - 0.01 * zr                  # denser down; range ~[2.05,2.95]
    temp = 10.0 + 0.1 * zr
    with NCWriter(hp, attrs={}) as w:
        w.create_dim("time", None)
        w.create_dim("s_rho", nz)
        w.create_dim("eta", ny)
        w.create_dim("xi", nx)
        for nm, a in (("temp", temp), ("rho", rho), ("z_r", zr)):
            w.create_var(nm, ("time", "s_rho", "eta", "xi"))
            w.write(nm, a, rec=0)
    out = str(tmp_path / "ip.nc")
    rc = sample_main([hp, "--var", "temp", "--sigmas", "2.5", "-o", out])
    assert rc == 0
    with open_dataset(out) as ds:
        v = np.asarray(ds["temp"][...])
    # rho = 2.5 sits at z = -50 -> temp = 5.0
    assert np.allclose(v[0], 5.0, atol=1e-6)


def test_nc3to4z_roundtrip(tmp_path):
    """nc3to4z (reference: Tools-Roms/nc3to4z.F): the compressed
    NetCDF-4/HDF5 copy holds identical data and is smaller for
    compressible content."""
    import os

    import numpy as np

    from roms_tpu.io.netcdf import NCWriter, open_dataset
    from roms_tpu.tools.nc3to4z import main as nc3to4z_main

    p = str(tmp_path / "raw.nc")
    rng = np.random.default_rng(0)
    big = np.repeat(rng.standard_normal((40, 50)), 8, axis=0)  # compressible
    with NCWriter(p, attrs={"title": "t"}) as w:
        w.create_dim("time", None)
        w.create_dim("y", big.shape[0])
        w.create_dim("x", big.shape[1])
        w.create_var("f", ("time", "y", "x"), "f8", {"units": "m"})
        for r in range(3):
            w.write("f", big * (r + 1), rec=r)
    rc = nc3to4z_main([p, "--level", "6"])
    assert rc == 0
    out = p + ".nc4"
    with open_dataset(out) as ds:
        got = np.asarray(ds["f"][...])
        assert ds["f"].attrs.get("units") in ("m", b"m")
    with open_dataset(p) as ds0:
        ref = np.asarray(ds0["f"][...])
    np.testing.assert_array_equal(got, ref)
    assert os.path.getsize(out) < 0.8 * os.path.getsize(p)


def test_ncjoin_parallel_matches_serial(tmp_path):
    """ncjoin_parallel (the ncjoin_mpi role, Tools-Roms/ncjoin_mpi.F)
    must reproduce serial ncjoin bit-for-bit, including record
    variables."""
    import numpy as np
    from roms_tpu.io.netcdf import NCWriter, open_dataset
    from roms_tpu.tools.partition import ncjoin, ncjoin_parallel, partit

    path = str(tmp_path / "whole.nc")
    nx, ny, nz = 20, 14, 5
    rng = np.random.default_rng(3)
    w = NCWriter(path, {"title": "join test"})
    w.create_dim("time", None)
    w.create_dim("s_rho", nz)
    w.create_dim("eta_rho", ny + 2)
    w.create_dim("xi_rho", nx + 2)
    w.create_dim("xi_u", nx + 1)
    w.create_var("ocean_time", ("time",), "f8", {})
    w.create_var("temp", ("time", "s_rho", "eta_rho", "xi_rho"), "f4", {})
    w.create_var("u", ("time", "s_rho", "eta_rho", "xi_u"), "f4", {})
    w.create_var("h", ("eta_rho", "xi_rho"), "f8", {})
    w.write("h", rng.standard_normal((ny + 2, nx + 2)))
    for r in range(3):
        w.write("ocean_time", float(r), rec=r)
        w.write("temp", rng.standard_normal((nz, ny + 2, nx + 2))
                .astype("f4"), rec=r)
        w.write("u", rng.standard_normal((nz, ny + 2, nx + 1))
                .astype("f4"), rec=r)
    w.close()

    parts = partit(path, 2, 2, out_dir=str(tmp_path / "parts"))
    ncjoin(parts, str(tmp_path / "ser.nc"))
    ncjoin_parallel(parts, str(tmp_path / "par.nc"))
    a = open_dataset(str(tmp_path / "ser.nc"))
    b = open_dataset(str(tmp_path / "par.nc"))
    orig = open_dataset(path)
    assert set(a.variables) == set(b.variables) == set(orig.variables)
    for n in a.variables:
        np.testing.assert_array_equal(np.asarray(a[n][...]),
                                      np.asarray(b[n][...]), err_msg=n)
        np.testing.assert_array_equal(np.asarray(a[n][...]),
                                      np.asarray(orig[n][...]),
                                      err_msg=f"{n} vs original")
