"""Upscaling tests (reference: src/upscale_output.F): the captured boundary
fluxes must equal the tracer mass leaving the domain."""

import numpy as np

from roms_tpu.cases import obc_basin
from roms_tpu.driver import run
from roms_tpu.io import open_dataset
from roms_tpu.io.upscale import UpscaleWriter


def test_upscale_capture_and_writer(tmp_path):
    cfg = obc_basin.config("inflow", ntimes=4).replace(
        nx=16, ny=16, nz=6, dt=60.0, ndtfast=20, upscale_output=True)
    grid, st, forcing = obc_basin.setup(cfg, inflow_u=0.1, t_inflow=2.0)

    p = str(tmp_path / "uscl.nc")
    uw = UpscaleWriter(p, grid, cfg, [("temp", 0, None)], navg=2)
    st_end, _ = run(grid, st, forcing, cfg,
                    step_hook=lambda s, i: uw.accumulate(s))
    uw.close()

    up = st_end.upscale
    assert set(up.keys()) == {"west", "east"}
    # captured at full local edge length; interior is [2:-2]
    w = np.asarray(up["west"][0])[:, 2:-2]   # (nz, ny)
    e = np.asarray(up["east"][0])[:, 2:-2]
    assert w.shape == (cfg.nz, cfg.ny)
    # inflow at the west: outward (westward) flux is NEGATIVE there,
    # and tracer leaves through the east: positive outward flux
    assert (w < 0.0).all()
    assert (e > 0.0).all()
    # magnitude sanity: |flux| ~ u * dy * hz * t
    dy = 1000.0
    hz = np.asarray(st_end.hz)[:, 8, 2]
    expect = 0.1 * dy * hz * 1.0
    np.testing.assert_allclose(np.abs(e[:, 6]), expect, rtol=0.3)

    with open_dataset(p) as ds:
        assert ds["temp_add_east"].shape == (2, cfg.nz, cfg.ny)
        assert np.isfinite(ds["temp_add_east"][...]).all()
