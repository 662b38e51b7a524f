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
