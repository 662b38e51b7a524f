"""Observability tests (reference: src/timers.F, src/error_handling_mod.F90,
src/diag.F blowup detection)."""

import numpy as np
import pytest

from roms_tpu.monitor import (BlowupError, ErrorLog, RomsAbort, Timers,
                              check_blowup)


def test_error_log_scopes_and_abort():
    log = ErrorLog()
    assert not log.abort_requested
    log.abort_check()  # no-op when clean
    log.raise_global("setup", "bad config")
    log.raise_from_point("rho_eos", "negative density", 3, 4, 5)
    assert log.abort_requested
    with pytest.raises(RomsAbort) as e:
        log.abort_check()
    assert "bad config" in str(e.value)
    assert "(3, 4, 5)" in str(e.value)


def test_blowup_detection():
    check_blowup((1e-5, 1e-6, 0.01), 3)  # finite: fine
    with pytest.raises(BlowupError):
        check_blowup((np.nan, 1e-6, 0.01), 4)
    with pytest.raises(BlowupError):
        check_blowup((np.inf, 1e-6, 0.01), 5)
    log = ErrorLog()
    with pytest.raises(BlowupError):
        check_blowup((np.nan,), 6, log)
    assert log.abort_requested


def test_timers_phases():
    import time
    t = Timers()
    t.tic("step2d")
    time.sleep(0.01)
    t.toc("step2d")
    t.tic("step2d")
    time.sleep(0.01)
    t.toc("step2d")
    assert t.phases["step2d"] >= 0.02
    b = t.banner()
    assert "run_time" in b and "step2d" in b


def test_diag_schedule_log_ramp():
    """ninfo>1: power-of-two ramp then every ninfo (reference diag.F:36-41)."""
    from roms_tpu.driver import _diag_due
    due = [i for i in range(33) if _diag_due(i, 10)]
    assert due == [0, 1, 2, 4, 8, 10, 20, 30]
    assert all(_diag_due(i, 1) for i in range(5))


def test_run_ninfo_and_error_log_wiring():
    """The driver honors ninfo (fewer diag rows, no per-step sync) and
    queues blowups into an ErrorLog."""
    import jax.numpy as jnp
    import pytest

    from roms_tpu.cases import filament
    from roms_tpu.driver import run
    from roms_tpu.monitor import BlowupError, ErrorLog, Timers

    cfg = filament.config().replace(nx=16, ny=16, nz=4, ntimes=5)
    grid, st, frc = filament.setup(cfg, dtype=jnp.float64)
    timers = Timers()
    _, rows = run(grid, st, frc, cfg, nsteps=5, ninfo=4, timers=timers)
    assert [int(r[0]) for r in rows] == [0, 1, 2, 4]
    assert timers.nsteps == 5 and timers.phases["step"] > 0.0

    # blowup queues into the log and still raises
    st_bad = st.replace(u=st.u + jnp.nan)
    log = ErrorLog()
    with pytest.raises(BlowupError):
        run(grid, st_bad, frc, cfg, nsteps=2, error_log=log)
    assert log.abort_requested
