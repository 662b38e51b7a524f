"""Forcing-engine tests: two-slot time interpolation, climatology cycling,
NetCDF-convention loading, Forcing materialization
(reference: src/roms_read_write.F ncforce machinery)."""

import numpy as np

from roms_tpu.cases import filament
from roms_tpu.forcing import (DAY, ForcingSet, Series, pad_bry, pad_field,
                              series_from_dataset)
from roms_tpu.io.netcdf import NCWriter, open_dataset


def test_series_linear_interp():
    times = np.array([0.0, 10.0, 20.0])
    recs = {0: np.zeros(4), 1: np.ones(4), 2: 3.0 * np.ones(4)}
    reads = []

    def read(i):
        reads.append(i)
        return recs[i]

    s = Series(times, read)
    np.testing.assert_allclose(s.value(5.0), 0.5)
    np.testing.assert_allclose(s.value(10.0), 1.0)
    np.testing.assert_allclose(s.value(15.0), 2.0)
    # clamped outside the axis
    np.testing.assert_allclose(s.value(-5.0), 0.0)
    np.testing.assert_allclose(s.value(25.0), 3.0)
    # the two-slot cache avoids rereads while marching forward
    reads.clear()
    for t in np.linspace(10.0, 20.0, 7):
        s.value(t)
    assert len(reads) == 0


def test_series_cycling():
    # 4-record annual climatology, cycle = 40
    times = np.array([5.0, 15.0, 25.0, 35.0])
    s = Series(times, lambda i: np.float64(i), cycle=40.0)
    np.testing.assert_allclose(s.value(10.0), 0.5)
    # wrap-around bracket: t=38 lies between rec3 (35) and rec0 (45)
    np.testing.assert_allclose(s.value(38.0), 3.0 * 0.7 + 0.0 * 0.3)
    # periodicity
    np.testing.assert_allclose(s.value(10.0 + 80.0), s.value(10.0))


def test_series_from_dataset(tmp_path):
    p = str(tmp_path / "frc.nc")
    w = NCWriter(p)
    w.create_dim("sms_time", None)
    w.create_dim("y", 3)
    w.create_var("sms_time", ("sms_time",), "f8", {"cycle_length": 360.0})
    w.create_var("sustr", ("sms_time", "y"), "f8")
    for r in range(3):
        w.write("sms_time", 30.0 + 120.0 * r, rec=r)
        w.write("sustr", np.full(3, float(r)), rec=r)
    w.close()

    with open_dataset(p) as ds:
        s = series_from_dataset(ds, "sustr")
        assert s.cycle == 360.0 * DAY
        np.testing.assert_allclose(s.value(90.0 * DAY), 0.5)


def test_forcing_set_materializes():
    cfg = filament.config().replace(nx=8, ny=8, nz=4)
    times = np.array([0.0, 100.0])
    sus = Series(times, lambda i: np.full((cfg.ny + 2, cfg.nx + 2), float(i)))
    stf = Series(times, lambda i: np.full((cfg.ny, cfg.nx), 2.0 * i))
    fs = ForcingSet(cfg, surface={"sustr": sus, "stflx_0": stf})
    f = fs.at(50.0)
    np.testing.assert_allclose(np.asarray(f.sustr), 0.5)
    np.testing.assert_allclose(np.asarray(f.stflx[0]), 1.0)

    # boundary series -> BoundaryData
    zw = Series(times, lambda i: np.full(cfg.ny + 2, float(i)))
    fs2 = ForcingSet(cfg, boundary={"zeta_west": zw})
    f2 = fs2.at(25.0)
    np.testing.assert_allclose(np.asarray(f2.bry.zeta_west), 0.25)
    assert f2.bry.zeta_west.shape == (cfg.ny + 2 * cfg.halo,)


def test_pad_helpers():
    cfg = filament.config().replace(nx=6, ny=4, nz=3)
    a = np.arange((cfg.ny + 2) * (cfg.nx + 2), dtype=float).reshape(
        cfg.ny + 2, cfg.nx + 2)
    p = pad_field(a, cfg)
    assert p.shape == (cfg.ny + 4, cfg.nx + 4)
    np.testing.assert_array_equal(p[1:-1, 1:-1], a)
    np.testing.assert_array_equal(p[0], p[1])

    b = np.arange(cfg.ny, dtype=float)
    pb = pad_bry(b, cfg)
    assert pb.shape == (cfg.ny + 4,)
    np.testing.assert_array_equal(pb[2:-2], b)


def test_qcorrection_restores_sst():
    """QCORRECTION: stflx(itemp) = -dSSTdt*(SST_model - sst_data) pulls
    the surface temperature toward the data; SFLX_CORR likewise adds the
    salinity restoring (reference: surf_flux.F:140-163)."""
    import jax.numpy as jnp
    import numpy as np

    from roms_tpu.cases import obc_basin
    from roms_tpu.driver import run

    cfg = obc_basin.config("closed", ntimes=4).replace(
        nx=12, ny=12, nz=4, ndtfast=10, salinity=True, nt=2,
        qcorrection=True, sflx_corr=True,
        dsstdt=5.0e-4, dsssdt=5.0e-4)
    grid, st, frc = obc_basin.setup(cfg)
    t0 = jnp.concatenate([st.t[:1], jnp.full_like(st.t[:1], 35.0)])
    st = st.replace(t=t0, t_prev=t0)
    jy, ix = cfg.ny + 4, cfg.nx + 4
    frc = frc.replace(sst=jnp.full((jy, ix), 5.0),     # colder than T=1? no:
                      sss=jnp.full((jy, ix), 30.0))    # fresher than S=35
    # model T=1, data SST=5 -> heating; model S=35, data 30 -> freshening
    s1, _ = run(grid, st, frc, cfg, nsteps=4, collect_diag=False)
    cfg_off = cfg.replace(qcorrection=False, sflx_corr=False)
    s0, _ = run(grid, st, frc, cfg_off, nsteps=4, collect_diag=False)
    dT = np.asarray(s1.t[0, -1, 6, 6] - s0.t[0, -1, 6, 6])
    dS = np.asarray(s1.t[1, -1, 6, 6] - s0.t[1, -1, 6, 6])
    assert dT > 1e-6          # warmed toward the data
    assert dS < -1e-6         # freshened toward the data
