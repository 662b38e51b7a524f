"""Shared harness for the USWC real-data regression cases.

Mirrors the reference's checker contract (reference:
tests/scripts/test_roms.py:66-141): every step of the four diagnostic
series (KINETIC_ENRG, BAROTR_KE, MAX_ADV_CFL, MAX_VERT_CFL) must match a
frozen oracle, plus the summed-series comparison the reference actually
performs.  The oracle files are self-frozen from this framework (see
CASES.md: the reference's own oracle numbers are functions of downloaded
input data that is unavailable offline), regenerated only by running
`ROMS_TPU_REGEN_ORACLES=1 python -m pytest tests/test_realcases_regression.py`.
"""

from __future__ import annotations

import os

import numpy as np

DATA = os.path.join(os.path.dirname(__file__), "data")


def oracle_path(case: str) -> str:
    return os.path.join(DATA, f"{case}_oracle.txt")


def run_case(module, workdir: str, ntimes: int, **build_kw):
    exp = module.build(str(workdir), ntimes=ntimes, **build_kw)
    _, rows = exp.run(nsteps=ntimes)
    exp.fileset.close()
    return np.asarray(rows)


def check_against_oracle(case: str, rows: np.ndarray,
                         rtol=(1e-9, 1e-8, 1e-9, 1e-8)):
    """Per-step series + summed-series check (reference:
    tests/scripts/test_roms.py sums each series over all steps and requires
    equality; here f64 allclose at the Filament-regression envelope)."""
    path = oracle_path(case)
    if os.environ.get("ROMS_TPU_REGEN_ORACLES"):
        np.savetxt(path, rows,
                   fmt=["%d", "%.16E", "%.16E", "%.16E", "%.16E"])
    oracle = np.loadtxt(path)
    assert rows.shape == oracle.shape, (
        f"{case}: oracle holds {oracle.shape[0]} steps, run made "
        f"{rows.shape[0]}")
    for col, rt in zip((1, 2, 3, 4), rtol):
        np.testing.assert_allclose(
            rows[:, col], oracle[:, col], rtol=rt, atol=1e-300,
            err_msg=f"{case}: diagnostics column {col} deviates")
        # the reference's actual pass criterion: summed series
        assert np.isclose(rows[:, col].sum(), oracle[:, col].sum(),
                          rtol=rt), f"{case}: summed series {col} deviates"
