"""mCDR forcing tests (reference: src/cdr_frc.F, src/vertical_remapping.F).

Key invariant (reference: step3d_t_ISO.F:884-886 "The global sum over all
cdr_prf for each tracer should be 1"): a release with tracer flux F [C m^3/s]
must raise the global tracer content integral sum(t*Hz*dA) by F*dt per step.
"""

import numpy as np
import jax.numpy as jnp

from roms_tpu.cases import obc_basin
from roms_tpu.cdr import (apply_cdr, cdr_3d, parameterized_releases,
                          profile_releases)
from roms_tpu.driver import run
from roms_tpu.remap import remap_src_to_grid


def test_remap_conserves_mass():
    rng = np.random.default_rng(1)
    h_src = rng.uniform(1.0, 5.0, 12)
    t_src = rng.normal(size=12) ** 2
    h_tgt = rng.uniform(0.5, 4.0, 20)
    t_tgt = remap_src_to_grid(h_src, t_src, h_tgt)
    np.testing.assert_allclose(np.sum(t_tgt * h_tgt),
                               np.sum(t_src * h_src), rtol=1e-12)


def test_remap_constant_profile():
    # a uniform profile remaps to (nearly) the same constant
    h_src = np.full(10, 3.0)
    h_tgt = np.full(15, 2.0)
    t_tgt = remap_src_to_grid(h_src, np.full(10, 7.0), h_tgt)
    np.testing.assert_allclose(t_tgt, 7.0, rtol=1e-10)


def _case(mode_kw):
    cfg = obc_basin.config("closed", ntimes=4).replace(
        nx=16, ny=16, nz=8, dt=30.0, ndtfast=20, **mode_kw)
    grid, st, forcing = obc_basin.setup(cfg)
    return cfg, grid, st, forcing


def _content(st, grid, cfg, itrc=0):
    h = cfg.halo
    intr = (slice(h, -h), slice(h, -h))
    hz = np.asarray(st.hz)[(slice(None),) + intr]
    t = np.asarray(st.t[itrc])[(slice(None),) + intr]
    da = 1.0 / (np.asarray(grid.pm) * np.asarray(grid.pn))
    return float(np.sum(t * hz * da[intr][None]))


def test_parameterized_release_mass_budget():
    cfg, grid, st, forcing = _case({})
    flux = 500.0  # [C m^3/s]
    cdr = parameterized_releases(
        cfg, grid, st.z_r, st.hz,
        cdr_lon=[8000.0], cdr_lat=[8000.0], cdr_dep=[50.0],
        cdr_hsc=[3000.0], cdr_vsc=[20.0],
        flx=np.full((1, cfg.nt), flux), xy_dist=True)
    # vertical+horizontal weights sum to exactly 1 per release
    np.testing.assert_allclose(float(jnp.sum(cdr.prf[:, 0, :])), 1.0,
                               rtol=1e-12)
    forcing = forcing.replace(cdr=cdr)

    c0 = _content(st, grid, cfg)
    st_end, rows = run(grid, st, forcing, cfg)
    c1 = _content(st_end, grid, cfg)
    expect = flux * cfg.dt * cfg.ntimes
    np.testing.assert_allclose(c1 - c0, expect, rtol=1e-7)


def test_profile_release_remap_and_point():
    cfg, grid, st, forcing = _case({})
    n_src = 12
    h_src = np.full((1, n_src), 100.0 / n_src)
    prof = np.zeros((1, 1, n_src))
    prof[0, 0, 4:7] = 1.0 / 3.0 / h_src[0, 0]  # unit total content
    cdr = profile_releases(cfg, grid, st.hz,
                           cdr_lon=[8000.0], cdr_lat=[8000.0],
                           cdr_hz_src=h_src, cdr_flx_dp=prof,
                           tracer_indices=[0], xy_dist=True)
    # remapped total content per unit column: sum(prf*hz) at the release
    j, i = int(cdr.jloc[0]), int(cdr.iloc[0])
    hz_col = np.asarray(st.hz)[:, j, i]
    got = float(np.sum(np.asarray(cdr.prf)[0, 0] * hz_col))
    np.testing.assert_allclose(got, 1.0, rtol=1e-10)


def test_cdr_3d_dense_budget():
    cfg, grid, st, forcing = _case({})
    h = cfg.halo
    flx3 = np.zeros((cfg.nt, cfg.nz) + st.zeta.shape)
    # uniform interior per-cell injection [C m^3/s]; domain content rises
    # by sum(flx3)*dt per step (see cdr_3d docstring)
    flx3[0, :, h:-h, h:-h] = 1.0e-4
    cdr = cdr_3d(cfg, flx3)
    forcing = forcing.replace(cdr=cdr)
    c0 = _content(st, grid, cfg)
    st_end, _ = run(grid, st, forcing, cfg)
    c1 = _content(st_end, grid, cfg)
    rate = float(np.sum(flx3[0]))
    # tolerance: the budget is a small difference of O(1e10) content
    # integrals, so float64 summation round-off is O(1e-4) absolute
    np.testing.assert_allclose(c1 - c0, rate * cfg.dt * cfg.ntimes,
                               rtol=1e-4)
