"""Pressure-flux decomposition + Orlanski sponge tuning tests
(reference: src/calc_pflx_mod.F, src/sponge_tune.F)."""

import jax.numpy as jnp
import numpy as np

from roms_tpu.cases import obc_basin
from roms_tpu.ops.weights import set_weights
from roms_tpu.pflx import calc_pflx, hydrostatic_pressure, init_pflx
from roms_tpu.sponge_tune import (adjust_orlanski, init_sponge_tune,
                                  to_boundary, UB_MAX, UB_MIN)
from roms_tpu.stepper import step


def _run(cfg, grid, st, frc, nsteps):
    w1, w2, _ = set_weights(cfg.ndtfast)
    w1 = jnp.asarray(w1, jnp.float64)
    w2 = jnp.asarray(w2, jnp.float64)
    s = st
    for i in range(nsteps):
        s = step(s, frc, grid, w1, w2, cfg, first_step=(i == 0))
    return s


def test_hydrostatic_pressure_uniform_density():
    cfg = obc_basin.config("closed").replace(nx=8, ny=8, nz=6)
    grid, st, frc = obc_basin.setup(cfg)
    # uniform density anomaly r: p/rho0 = g*zeta + (g/rho0)*r*(depth above)
    r = 1.5
    p = np.asarray(hydrostatic_pressure(st.zeta, jnp.full_like(st.rho, r),
                                        st.hz, cfg))
    zw = np.asarray(st.z_w)
    hz = np.asarray(st.hz)
    zeta = np.asarray(st.zeta)
    # discrete integral lands at the cell MIDPOINT (not the stretched z_r)
    zmid = zw[:-1] + 0.5 * hz
    expect = (cfg.g * zeta[None]
              + (cfg.g / cfg.rho0) * r * (zw[-1][None] - zmid))
    np.testing.assert_allclose(p, expect, rtol=1e-12)


def test_pflx_filter_converges_on_steady_flow():
    """A steady field has no fast component once the filter has spun up:
    up/vp -> 0 (reference: calc_pflx slow/fast split)."""
    cfg = obc_basin.config("radiating").replace(nx=16, ny=16, nz=6,
                                                ndtfast=20)
    grid, st, frc = obc_basin.setup(cfg)
    s = _run(cfg, grid, st, frc, 2)
    pf = init_pflx(cfg)
    up1 = vp1 = None
    for _ in range(60):   # dt/timescale = 0.5 -> slow tracks fast quickly
        pf, up, vp = calc_pflx(pf, s, grid, cfg, timescale=2 * cfg.dt)
        if up1 is None:
            up1 = np.abs(np.asarray(up)).max()
    upN = np.abs(np.asarray(up)).max()
    assert np.isfinite(upN)
    assert upN < 1e-3 * max(up1, 1e-300)


def test_adjust_orlanski_moves_toward_parent_flux():
    cfg = obc_basin.config("radiating").replace(nx=16, ny=16, nz=6)
    tun = init_sponge_tune(cfg)
    assert float(tun.ub_west[0]) == cfg.ubind
    jy, ix = cfg.ny + 4, cfg.nx + 4
    up = jnp.zeros((jy, ix))
    vp = jnp.zeros((jy, ix))
    pflx = {e: jnp.full((jy if e in ("west", "east") else ix,), 1.0)
            for e in ("west", "east", "south", "north")}
    t1 = adjust_orlanski(tun, up, vp, pflx, cfg, sp_timscale=100 * cfg.dt)
    # parent flux exceeds child flux: binding strengthens on west/south,
    # (sign flips north/east, reference: sponge_tune.F:223-246)
    assert float(t1.ub_west[5]) > cfg.ubind
    assert float(t1.ub_south[5]) > cfg.ubind
    assert float(t1.ub_east[5]) < cfg.ubind
    assert float(t1.ub_north[5]) < cfg.ubind
    # clamping
    big = {e: jnp.full_like(v, 1e9) for e, v in pflx.items()}
    t2 = adjust_orlanski(t1, up, vp, big, cfg, sp_timscale=cfg.dt)
    assert float(t2.ub_west[5]) == UB_MAX
    assert float(t2.ub_north[5]) == UB_MIN


def test_tuned_ubind_feeds_orlanski_bcs():
    """BoundaryData.ub_* arrays must reproduce the scalar path bitwise
    when they equal cfg.ubind, and change the solution when different."""
    cfg = obc_basin.config("radiating").replace(nx=16, ny=16, nz=6,
                                                ndtfast=16, obc_m2="orlanski")
    grid, st, frc = obc_basin.setup(cfg)
    s0 = _run(cfg, grid, st, frc, 3)

    tun = init_sponge_tune(cfg)
    frc_t = frc.replace(bry=to_boundary(tun, frc.bry))
    s1 = _run(cfg, grid, st, frc_t, 3)
    np.testing.assert_array_equal(np.asarray(s1.zeta), np.asarray(s0.zeta))

    tun2 = tun.replace(ub_west=tun.ub_west * 0.0 + 1.5)
    frc_2 = frc.replace(bry=to_boundary(tun2, frc.bry))
    s2 = _run(cfg, grid, st, frc_2, 3)
    assert not np.allclose(np.asarray(s2.ubar), np.asarray(s0.ubar))
