"""End-to-end regression of the USWC real-data cases against frozen
diagnostics oracles (reference: tests/{Flux_frc,Rivers_real,Pipes_real}/
benchmark.result_github_gnu; checker tests/scripts/test_roms.py:66-141).

Each case runs its reference-format roms.in through the FULL file path:
generated reference-schema NetCDF inputs -> grid/init readers ->
multi-file forcing search -> two-slot time interpolation -> stepper.
See CASES.md for why the oracles are self-frozen rather than the
reference's own numbers (the reference's input data is download-only).
"""

import pytest

from realcase_utils import check_against_oracle, run_case

from roms_tpu.cases import flux_frc, pipes_real, rivers_real

CASES = {
    "flux_frc": (flux_frc, 20),
    "rivers_real": (rivers_real, 20),
    "pipes_real": (pipes_real, 20),
}


@pytest.mark.parametrize("case", sorted(CASES))
def test_realcase_regression(case, tmp_path):
    mod, nsteps = CASES[case]
    rows = run_case(mod, tmp_path, nsteps)
    check_against_oracle(case, rows)


def test_pipe_and_river_actually_fire(tmp_path):
    """Guard against silently-disabled sources: the pipe/river cases'
    oracle series must differ from the source-free Flux_frc series at the
    same dt (pipes runs at dt=20 like flux_frc)."""
    import numpy as np
    from realcase_utils import oracle_path
    flux = np.loadtxt(oracle_path("flux_frc"))
    pipes = np.loadtxt(oracle_path("pipes_real"))
    assert not np.allclose(flux[:, 3], pipes[:, 3], rtol=1e-9)
