"""Open-boundary condition tests.

The reference validates OBCs only through realistic cases needing external
input files (reference: tests/Flux_frc); here we use physics invariants:
a barotropic wave must RADIATE OUT through Flather boundaries (energy drops)
while it stays trapped in a closed basin, and specified-inflow boundaries
must advect external tracer values into the domain.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from roms_tpu.cases import obc_basin
from roms_tpu.driver import run


def _barotropic_energy(state, grid, cfg):
    """g*zeta^2 (PE) + D*(ubar^2+vbar^2) (KE) volume integral, interior."""
    h = cfg.halo
    intr = (slice(h, -h), slice(h, -h))
    z = np.asarray(state.zeta)[intr]
    ub = np.asarray(state.ubar)[intr]
    vb = np.asarray(state.vbar)[intr]
    d = np.asarray(grid.h)[intr] + z
    pe = 9.81 * (z ** 2).sum()
    ke = (d * (ub ** 2 + vb ** 2)).sum()
    return pe + ke


@pytest.mark.parametrize("mode", ["radiating"])
def test_flather_radiates_wave_out(mode):
    cfg = obc_basin.config(mode, ntimes=60)
    grid, st, forcing = obc_basin.setup(cfg)
    e0 = _barotropic_energy(st, grid, cfg)

    st_end, rows = run(grid, st, forcing, cfg)
    assert np.isfinite(rows[:, 1]).all(), "diagnostics went non-finite"
    e1 = _barotropic_energy(st_end, grid, cfg)

    # closed twin: same initial state, walls everywhere
    cfg_c = obc_basin.config("closed", ntimes=60)
    grid_c, st_c, forcing_c = obc_basin.setup(cfg_c)
    st_c_end, rows_c = run(grid_c, st_c, forcing_c, cfg_c)
    e1_closed = _barotropic_energy(st_c_end, grid_c, cfg_c)

    # open boundaries radiate: >85% of the initial barotropic energy leaves;
    # the closed basin keeps the bulk of it
    assert e1 < 0.15 * e0, f"open basin kept too much energy: {e1/e0:.3f}"
    assert e1_closed > 0.5 * e0, (
        f"closed basin lost too much energy: {e1_closed/e0:.3f}")
    assert bool(jnp.all(jnp.isfinite(st_end.zeta)))


def test_specified_inflow_advects_tracer():
    cfg = obc_basin.config("inflow", ntimes=40)
    grid, st, forcing = obc_basin.setup(cfg, inflow_u=0.1, t_inflow=2.0)

    st_end, rows = run(grid, st, forcing, cfg)
    assert np.isfinite(rows[:, 1]).all()
    t = np.asarray(st_end.t[0])
    h = cfg.halo
    # specified BC: ghost ring on the west edge holds the inflow value
    np.testing.assert_allclose(t[:, h:-h, 1], 2.0, rtol=1e-12)
    # downstream interior is still near the initial value
    assert abs(float(t[:, h:-h, cfg.nx // 2].mean()) - 1.0) < 0.1
    # flow stays near the specified inflow speed
    u = np.asarray(st_end.u)
    assert abs(float(u[:, h:-h, h:-h].mean()) - 0.1) < 0.05
    assert np.isfinite(np.asarray(st_end.zeta)).all()
