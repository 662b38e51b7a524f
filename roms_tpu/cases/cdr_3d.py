"""CDR_3d test case (reference: tests/CDR_3d/): mCDR forcing from full-3D
ALK/DIC tracer-flux fields (reference: src/cdr_frc.F:111-114, cdr_frc.opt
forcing_3d).  Physics/configuration shared with the other CDR cases — see
roms_tpu.cases.cdr_real."""

from __future__ import annotations

from roms_tpu.cases.cdr_real import TRACER_NAMES, base_config  # noqa: F401
from roms_tpu.cases import cdr_real
from roms_tpu.experiment import Experiment


def build(workdir: str, ntimes: int = 10, dtype=None) -> Experiment:
    return cdr_real.build(workdir, "3d", ntimes=ntimes, dtype=dtype)
