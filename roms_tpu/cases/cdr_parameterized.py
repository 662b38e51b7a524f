"""CDR_parameterized test case (reference: tests/CDR_parameterized/):
Gaussian-footprint mCDR releases from lon/lat/depth/scale parameters
(reference: src/cdr_frc.F:264-292, cdr_frc.opt forcing_parameterized).
Physics/configuration shared with the other CDR cases — see
roms_tpu.cases.cdr_real."""

from __future__ import annotations

from roms_tpu.cases.cdr_real import TRACER_NAMES, base_config  # noqa: F401
from roms_tpu.cases import cdr_real
from roms_tpu.experiment import Experiment


def build(workdir: str, ntimes: int = 10, dtype=None) -> Experiment:
    return cdr_real.build(workdir, "parameterized", ntimes=ntimes,
                          dtype=dtype)
