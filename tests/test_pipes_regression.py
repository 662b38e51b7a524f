"""End-to-end regression of the Pipes_ana case (submerged point source with
vertical dispersion profile) against the reference's frozen diagnostics
(reference: tests/Pipes_ana/benchmark.result_github_gnu).

Like Rivers_ana this case is chaotic at round-off level; we require
round-off agreement on the first steps and <2% on every later step (the
flow reaches Courant numbers ~0.23 by step 20).
"""

import os

import numpy as np
import pytest

from roms_tpu.cases import pipes_ana
from roms_tpu.driver import run

ORACLE = os.path.join(os.path.dirname(__file__), "data",
                      "pipes_ana_oracle.txt")


@pytest.fixture(scope="module")
def pipes_rows():
    cfg = pipes_ana.config(ntimes=20)
    grid, st, frc = pipes_ana.setup(cfg)
    _, rows = run(grid, st, frc, cfg, nsteps=20)
    return rows


def test_early_steps_roundoff(pipes_rows):
    oracle = np.loadtxt(ORACLE)
    np.testing.assert_allclose(pipes_rows[0][3:5], oracle[0][3:5], rtol=1e-11)
    np.testing.assert_allclose(pipes_rows[1][3:5], oracle[1][3:5], rtol=1e-9)
    np.testing.assert_allclose(pipes_rows[2][1:5], oracle[2][1:5], rtol=1e-5)


def test_trajectory_envelope(pipes_rows):
    oracle = np.loadtxt(ORACLE)
    for col in (1, 2, 3, 4):
        sel = oracle[:, col] != 0.0
        rel = (np.abs(pipes_rows[sel, col] - oracle[sel, col])
               / np.abs(oracle[sel, col]))
        assert rel.max() < 2e-2, f"column {col}: {rel.max():.2e}"
