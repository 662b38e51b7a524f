"""Asynchronous host I/O (SURVEY §7(f)): forcing record prefetch must
hide reader latency from the step loop, and the async writer hook must
produce byte-identical output to the synchronous path."""

import time

import jax.numpy as jnp
import numpy as np

from roms_tpu.forcing import Series


def test_series_prefetch_hides_reader_latency():
    """A 100 ms-latency reader: after warmup, advancing across record
    boundaries must NOT pay the read latency (the next record was
    background-read while 'the device integrated')."""
    latency = 0.1
    reads = []

    def slow_read(i):
        reads.append(i)
        time.sleep(latency)
        return np.full((4, 4), float(i))

    times = np.arange(10, dtype=np.float64) * 100.0
    s = Series(times, slow_read, name="slow")

    s.value(0.0)                     # warm: reads rec 0, 1; schedules 2
    time.sleep(2.5 * latency)        # "device compute" window
    t0 = time.perf_counter()
    v = s.value(105.0)               # crosses into bracket (1, 2)
    dt = time.perf_counter() - t0
    assert dt < 0.5 * latency, f"boundary crossing stalled {dt*1e3:.0f} ms"
    np.testing.assert_allclose(v, 1.0 + 0.05)

    # steady state: each crossing is pre-fetched
    for k in range(2, 6):
        time.sleep(2.5 * latency)
        t0 = time.perf_counter()
        s.value(k * 100.0 + 5.0)
        assert time.perf_counter() - t0 < 0.5 * latency
    # every record read exactly once
    assert sorted(set(reads)) == sorted(reads)


def test_series_prefetch_values_identical():
    """Prefetch on/off must interpolate identically (incl. cycling)."""
    rng = np.random.default_rng(0)
    data = rng.standard_normal((6, 3, 3))
    times = np.arange(6, dtype=np.float64) * 50.0

    def read(i):
        return data[i]

    a = Series(times, read, cycle=300.0, name="a", prefetch=True)
    b = Series(times, read, cycle=300.0, name="b", prefetch=False)
    for t in np.linspace(0.0, 900.0, 37):
        np.testing.assert_array_equal(a.value(t), b.value(t))


def test_async_hook_output_identical(tmp_path):
    """driver.run with an async writer hook produces the same history file
    as the synchronous hook, and drains before returning."""
    from roms_tpu.cases import obc_basin
    from roms_tpu.driver import run
    from roms_tpu.io import HistoryWriter
    from roms_tpu.io.async_io import make_async_hook
    from roms_tpu.io.netcdf import open_dataset

    cfg = obc_basin.config("inflow", ntimes=3).replace(
        nx=12, ny=10, nz=4, dt=60.0, ndtfast=12)
    grid, st, frc = obc_basin.setup(cfg, inflow_u=0.1, t_inflow=2.0)

    paths = {}
    for mode in ("sync", "async"):
        path = str(tmp_path / f"his_{mode}.nc")
        hw = HistoryWriter(path, grid, cfg)
        hook = (lambda s, i, hw=hw: hw.write(s))
        if mode == "async":
            hook = make_async_hook(hook)
        run(grid, st, frc, cfg, nsteps=3, step_hook=hook,
            collect_diag=False)
        hw.close()
        paths[mode] = path

    a = open_dataset(paths["sync"])
    b = open_dataset(paths["async"])
    for name in ("zeta", "temp", "u"):
        np.testing.assert_array_equal(np.asarray(a[name][...]),
                                      np.asarray(b[name][...]),
                                      err_msg=name)
