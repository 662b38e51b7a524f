"""I/O tests: NetCDF roundtrip, history writing, exact restart.

The exact-restart contract mirrors the reference's EXACT_RESTART: a run
interrupted by a restart write/read must be bit-identical to an
uninterrupted run (reference: set_global_definitions.h:104-112,
get_init.F:58-66).
"""

import dataclasses

import numpy as np

from roms_tpu.cases import filament
from roms_tpu.driver import run
from roms_tpu.io import HistoryWriter, open_dataset, read_restart, write_restart
from roms_tpu.io.netcdf import NCWriter


def test_netcdf3_roundtrip(tmp_path):
    p = str(tmp_path / "t.nc")
    w = NCWriter(p, {"title": "roundtrip"})
    w.create_dim("time", None)
    w.create_dim("x", 5)
    w.create_var("a", ("time", "x"), "f8", {"units": "m"})
    w.create_var("b", ("x",), "f4")
    w.write("b", np.arange(5, dtype=np.float32))
    w.write("a", np.arange(5.0) * 2, rec=0)
    w.write("a", np.arange(5.0) * 3, rec=1)
    w.close()

    with open_dataset(p) as ds:
        assert ds.attrs["title"] == "roundtrip"
        assert ds["a"].dims == ("time", "x")
        np.testing.assert_allclose(ds["a"][1], np.arange(5.0) * 3)
        np.testing.assert_allclose(ds["b"][...], np.arange(5.0))
        assert ds["a"].attrs["units"] == "m"


def test_hdf5_netcdf4_read(tmp_path):
    import h5py
    p = str(tmp_path / "t4.nc")
    with h5py.File(p, "w") as f:
        f.attrs["title"] = "h5"
        d = f.create_dataset("zeta", data=np.ones((4, 6)))
        d.attrs["units"] = "meter"
    with open_dataset(p) as ds:
        assert ds.attrs["title"] == "h5"
        np.testing.assert_allclose(ds["zeta"][...], 1.0)
        assert ds["zeta"].attrs["units"] == "meter"


def test_history_writer(tmp_path):
    cfg = filament.config(ntimes=2).replace(nx=16, ny=16, nz=8)
    grid, st, forcing = filament.setup(cfg)
    p = str(tmp_path / "his.nc")
    hw = HistoryWriter(p, grid, cfg)
    hw.write(st)
    st2, _ = run(grid, st, forcing, cfg, nsteps=1, collect_diag=False)
    hw.write(st2)
    hw.close()

    with open_dataset(p) as ds:
        assert ds["zeta"].shape == (2, cfg.ny + 2, cfg.nx + 2)
        assert ds["u"].shape == (2, cfg.nz, cfg.ny + 2, cfg.nx + 1)
        assert ds["temp"].shape == (2, cfg.nz, cfg.ny + 2, cfg.nx + 2)
        assert np.isfinite(ds["zeta"][...]).all()
        z0 = np.asarray(st.zeta)[1:-1, 1:-1].astype(np.float32)
        np.testing.assert_array_equal(ds["zeta"][0], z0)
        assert "config" in ds.attrs


def test_exact_restart(tmp_path):
    cfg = filament.config(ntimes=10).replace(nx=16, ny=16, nz=8)
    grid, st0, forcing = filament.setup(cfg)

    # uninterrupted 6 steps
    st_ref, _ = run(grid, st0, forcing, cfg, nsteps=6, collect_diag=False)

    # 3 steps, restart write/read, 3 more steps (restarted runs continue
    # with first_step=False exactly like the reference's exact restart)
    st_a, _ = run(grid, st0, forcing, cfg, nsteps=3, collect_diag=False)
    p = str(tmp_path / "rst.nc")
    write_restart(p, st_a, cfg)
    st_b = read_restart(p, cfg)

    from roms_tpu.ops.weights import set_weights
    from roms_tpu.stepper import step
    import jax.numpy as jnp
    w1, w2, _ = set_weights(cfg.ndtfast)
    w1 = jnp.asarray(w1, st_b.zeta.dtype)
    w2 = jnp.asarray(w2, st_b.zeta.dtype)
    for _ in range(3):
        st_b = step(st_b, forcing, grid, w1, w2, cfg, first_step=False)

    for f in dataclasses.fields(st_ref):
        a = np.asarray(getattr(st_ref, f.name))
        b = np.asarray(getattr(st_b, f.name))
        np.testing.assert_array_equal(a, b, err_msg=f.name)
