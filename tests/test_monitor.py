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
