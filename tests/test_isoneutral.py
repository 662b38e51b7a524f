"""Rotated (isoneutral) biharmonic diffusion tests
(reference: ADV_ISONEUTRAL in src/step3d_t_ISO.F, slope fields from
src/prsgrd.F + src/step3d_uv2.F).

Physics invariants: the operator is flux-form (conserves tracer content in
a closed basin), leaves a uniform tracer untouched, and dissipates tracer
variance relative to the same run without it.
"""

import numpy as np
import jax.numpy as jnp

from roms_tpu.cases import obc_basin
from roms_tpu.driver import run


def _setup(iso: bool, ntimes=6):
    cfg = obc_basin.config("closed", ntimes=ntimes).replace(
        nx=16, ny=16, nz=8, dt=60.0, ndtfast=20,
        adv_isoneutral=iso, sw_triads=True, stabilize=True)
    grid, st, forcing = obc_basin.setup(cfg)
    # stratified T with a horizontal anomaly (drives isoneutral fluxes)
    z = np.asarray(st.z_r)
    x = np.asarray(grid.xr)
    t0 = 14.0 + 8.0 * np.exp(z / 50.0) \
        + 0.5 * np.sin(2 * np.pi * x / 16000.0)[None]
    t = st.t.at[0].set(jnp.asarray(t0, st.zeta.dtype))
    st = st.replace(t=t, t_prev=t)
    return cfg, grid, st, forcing


def _content_var(st, grid, cfg):
    h = cfg.halo
    intr = (slice(h, -h), slice(h, -h))
    hz = np.asarray(st.hz)[(slice(None),) + intr]
    t = np.asarray(st.t[0])[(slice(None),) + intr]
    vol = hz.sum()
    c = np.sum(t * hz)
    mean = c / vol
    var = np.sum((t - mean) ** 2 * hz)
    return c, var


def test_isoneutral_conserves_and_dissipates():
    cfg_i, grid, st, forcing = _setup(True)
    c0, v0 = _content_var(st, grid, cfg_i)
    st_iso, rows = run(grid, st, forcing, cfg_i)
    assert np.isfinite(rows[:, 1]).all()
    c1, v1 = _content_var(st_iso, grid, cfg_i)
    # flux form: content conserved (round-off of big sums)
    np.testing.assert_allclose(c1, c0, rtol=1e-11)

    cfg_n, grid_n, st_n, forcing_n = _setup(False)
    st_ref, _ = run(grid_n, st_n, forcing_n, cfg_n)
    _, v_ref = _content_var(st_ref, grid_n, cfg_n)
    # the rotated biharmonic dissipates tracer variance beyond the base run
    assert v1 < v_ref
    # and actually did something (the short run's genuine isoneutral signal
    # is ~1e-6 relative; np.allclose's default rtol=1e-5 would call that
    # "equal", so threshold explicitly)
    assert np.abs(np.asarray(st_iso.t[0])
                  - np.asarray(st_ref.t[0])).max() > 1e-7


def test_isoneutral_uniform_tracer_untouched():
    cfg, grid, st, forcing = _setup(True, ntimes=3)
    t = jnp.full_like(st.t, 5.0)
    st = st.replace(t=t, t_prev=t)
    st_end, _ = run(grid, st, forcing, cfg)
    h = cfg.halo
    tt = np.asarray(st_end.t[0])[:, h:-h, h:-h]
    np.testing.assert_allclose(tt, 5.0, rtol=1e-12)
