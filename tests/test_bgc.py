"""BGC coupling tests: the NPZD built-in ecosystem run through the full
tracer engine at nt = 1 + 4 (reference analog: bgc_real case with BEC,
tests/bgc_real/).

Invariant: the NPZD source/sink network conserves total nitrogen pointwise
and sinking conserves it columnwise, so in a closed basin with no surface
flux the domain-total N content is conserved to round-off while the
individual pools exchange mass.
"""

import numpy as np
import jax.numpy as jnp

from roms_tpu.bgc.api import get_model
from roms_tpu.cases import obc_basin
from roms_tpu.driver import run


def _setup(ntimes=6):
    model = get_model("npzd")
    nb = model.ntracers
    cfg = obc_basin.config("closed", ntimes=ntimes).replace(
        nx=16, ny=16, nz=10, dt=300.0, ndtfast=40,
        nt=1 + nb, bgc_model="npzd", n_bgc=nb)
    grid, st, forcing = obc_basin.setup(cfg)
    # overwrite BGC tracers with the model's initial profiles
    tb = model.init_tracers(cfg, st.z_r)
    t = st.t.at[1:].set(tb)
    st = st.replace(t=t, t_prev=t)
    # daylight so phytoplankton grow
    forcing = forcing.replace(srflx=jnp.full_like(st.zeta, 200.0 / (1000.0 * 3985.0)))
    # solar penetration profile (Jerlov I-ish double exponential)
    zw = np.asarray(st.z_w)
    frac = 0.58 * np.exp(zw / 0.35) + 0.42 * np.exp(zw / 23.0)
    st = st.replace(swrf=jnp.asarray(frac, st.zeta.dtype))
    return model, cfg, grid, st, forcing


def _total_n(st, grid, cfg):
    h = cfg.halo
    intr = (slice(h, -h), slice(h, -h))
    hz = np.asarray(st.hz)[(slice(None),) + intr]
    da = 1.0 / (np.asarray(grid.pm) * np.asarray(grid.pn))[intr]
    tot = 0.0
    for i in range(1, cfg.nt):
        tot += np.sum(np.asarray(st.t[i])[(slice(None),) + intr] * hz * da)
    return float(tot)


def test_npzd_conserves_nitrogen_and_grows():
    model, cfg, grid, st, forcing = _setup()
    n0 = _total_n(st, grid, cfg)
    p0 = float(np.sum(np.asarray(st.t[2])))  # total PHYT (proxy)
    st_end, rows = run(grid, st, forcing, cfg)
    assert np.isfinite(rows[:, 1]).all()
    n1 = _total_n(st_end, grid, cfg)
    np.testing.assert_allclose(n1, n0, rtol=1e-9)
    # with light and nutrients, phytoplankton biomass increases
    p1 = float(np.sum(np.asarray(st_end.t[2])))
    assert p1 > p0
    for i in range(1, cfg.nt):
        assert np.isfinite(np.asarray(st_end.t[i])).all()


def test_npzd_dark_no_growth():
    model, cfg, grid, st, forcing = _setup(ntimes=4)
    forcing = forcing.replace(srflx=jnp.zeros_like(st.zeta))
    p0 = float(np.sum(np.asarray(st.t[2])))
    st_end, _ = run(grid, st, forcing, cfg)
    p1 = float(np.sum(np.asarray(st_end.t[2])))
    assert p1 < p0  # grazing + mortality only


def test_model_registry():
    m = get_model("npzd")
    assert m.ntracers == 4
    assert tuple(m.tracer_names) == ("NO3", "PHYT", "ZOO", "DET")
