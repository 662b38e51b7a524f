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


def tracer_masses(state, grid) -> np.ndarray:
    """Per-tracer grid-integrated content sum(t * Hz * rmask / (pm*pn))
    over the interior — the regression hook for the tracer/BGC/CDR path,
    which the reference's 4 dynamics series cannot see (BGC tracers do
    not feed back on density)."""
    t = np.asarray(state.t, np.float64)[..., 2:-2, 2:-2]
    hz = np.asarray(state.hz, np.float64)[..., 2:-2, 2:-2]
    rmask = np.asarray(grid.rmask, np.float64)[2:-2, 2:-2]
    da = np.asarray(1.0 / (grid.pm * grid.pn), np.float64)[2:-2, 2:-2]
    # land/boundary-ring cells can legitimately hold non-finite garbage
    # (masked out of the physics, like the reference's unset land values);
    # zero them BEFORE the weighted sum — numpy NaN*0 is NaN, not 0
    t = np.where((rmask > 0.0)[None, None], t, 0.0)
    hz = np.where((rmask > 0.0)[None], hz, 0.0)
    return (t * hz[None] * (rmask * da)[None, None]).sum(axis=(1, 2, 3))


def run_case(module, workdir: str, ntimes: int, **build_kw):
    exp = module.build(str(workdir), ntimes=ntimes, **build_kw)
    st, rows = exp.run(nsteps=ntimes)
    masses = tracer_masses(st, exp.grid)
    exp.fileset.close()
    return np.asarray(rows), masses


def check_against_oracle(case: str, rows: np.ndarray,
                         masses: np.ndarray = None,
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
    if masses is not None:
        mpath = os.path.join(DATA, f"{case}_mass_oracle.txt")
        if os.environ.get("ROMS_TPU_REGEN_ORACLES"):
            np.savetxt(mpath, masses, fmt="%.16E")
        m_oracle = np.atleast_1d(np.loadtxt(mpath))
        np.testing.assert_allclose(
            masses, m_oracle, rtol=1e-9,
            err_msg=f"{case}: final tracer content deviates "
                    f"(tracer/BGC/CDR path regression)")
