"""End-to-end regression of the Filament case against the reference's frozen
diagnostics series (reference: tests/Filament/benchmark.result_github_gnu;
oracle checker: tests/scripts/test_roms.py).

The reference demands exact equality between identical builds; across
architectures bit-exactness is impossible, so we require float64 agreement
to ~1e-9 relative on every step of KINETIC_ENRG / BAROTR_KE / MAX_ADV_CFL /
MAX_VERT_CFL — far below any discretization change and far above f64
round-off reordering noise.
"""

import os

import numpy as np
import pytest

from roms_tpu.cases import filament
from roms_tpu.driver import run

ORACLE = os.path.join(os.path.dirname(__file__), "data", "filament_oracle.txt")


def load_oracle():
    return np.loadtxt(ORACLE)


@pytest.fixture(scope="module")
def filament_rows():
    cfg = filament.config(ntimes=20)
    grid, st, frc = filament.setup(cfg)
    _, rows = run(grid, st, frc, cfg, nsteps=20)
    return rows


def test_step0_diag(filament_rows):
    oracle = load_oracle()
    mine = filament_rows[0]
    assert np.allclose(mine[1:4], oracle[0][1:4], rtol=1e-11)
    assert mine[4] == 0.0


def test_twenty_step_series(filament_rows):
    oracle = load_oracle()
    rows = filament_rows
    assert rows.shape[0] == 21
    # KINETIC_ENRG, BAROTR_KE, MAX_ADV_CFL columns, every step
    for col, rtol in ((1, 1e-9), (2, 1e-8), (3, 1e-9)):
        np.testing.assert_allclose(
            rows[:, col], oracle[:, col], rtol=rtol,
            err_msg=f"diagnostics column {col} deviates from the reference")
    # MAX_VERT_CFL is identically zero in this case
    np.testing.assert_allclose(rows[:, 4], 0.0, atol=1e-12)


def test_summed_series_contract(filament_rows):
    """The reference oracle compares the SUM over steps of each series
    (reference: tests/scripts/test_roms.py:66-141)."""
    oracle = load_oracle()
    for col in (1, 2, 3):
        assert np.isclose(filament_rows[:, col].sum(), oracle[:, col].sum(),
                          rtol=1e-9)
