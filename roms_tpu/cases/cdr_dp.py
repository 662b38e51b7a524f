"""CDR_dp test case (reference: tests/CDR_dp/): mCDR forcing from
layerwise ALK/DIC depth profiles, conservatively remapped onto the model
levels (reference: src/cdr_frc.F:189-243, cdr_frc.opt
forcing_depth_profiles).  Physics/configuration shared with the other CDR
cases — see roms_tpu.cases.cdr_real."""

from __future__ import annotations

from roms_tpu.cases.cdr_real import TRACER_NAMES, base_config  # noqa: F401
from roms_tpu.cases import cdr_real
from roms_tpu.experiment import Experiment


def build(workdir: str, ntimes: int = 10, dtype=None) -> Experiment:
    return cdr_real.build(workdir, "dp", ntimes=ntimes, dtype=dtype)
