"""Tidal forcing unit tests (reference: src/tides.F)."""

import numpy as np
import jax.numpy as jnp

from roms_tpu.cases import obc_basin
from roms_tpu.state import zero_boundary
from roms_tpu.tides import TidalForcing, set_tides


def _tides(cfg, ntides=2, pot=True):
    h = cfg.halo
    jy, ix = cfg.ny + 2 * h, cfg.nx + 2 * h
    rng = np.random.default_rng(0)
    amp = lambda: jnp.asarray(rng.normal(size=(ntides, jy, ix)))
    return TidalForcing(
        ftide=jnp.asarray([1.4e-4, 1.0e-4]),
        ztide_re=amp(), ztide_im=amp(),
        utide_re=amp(), utide_im=amp(),
        vtide_re=amp(), vtide_im=amp(),
        ptide_re=amp() if pot else None,
        ptide_im=amp() if pot else None)


def test_harmonic_values_and_edges():
    cfg = obc_basin.config("radiating", ntimes=1)
    td = _tides(cfg)
    bry0 = zero_boundary(cfg)
    t = 3600.0
    bry, ptide = set_tides(td, t, cfg, bry0)

    om = np.asarray(td.ftide) * (t + 0.5 * cfg.dt)
    co, si = np.cos(om), np.sin(om)

    zw_expect = (np.asarray(td.ztide_re)[:, :, 1] * co[:, None]
                 - np.asarray(td.ztide_im)[:, :, 1] * si[:, None]).sum(0)
    np.testing.assert_allclose(np.asarray(bry.zeta_west), zw_expect,
                               rtol=1e-9, atol=1e-12)
    # ubar west from the boundary u-column (index 2)
    uw_expect = (np.asarray(td.utide_re)[:, :, 2] * co[:, None]
                 - np.asarray(td.utide_im)[:, :, 2] * si[:, None]).sum(0)
    np.testing.assert_allclose(np.asarray(bry.ubar_west), uw_expect,
                               rtol=1e-9, atol=1e-12)
    # potential tide over the full domain
    p_expect = (np.asarray(td.ptide_re) * co[:, None, None]
                - np.asarray(td.ptide_im) * si[:, None, None]).sum(0)
    np.testing.assert_allclose(np.asarray(ptide), p_expect, rtol=1e-9, atol=1e-12)

    # additive on top of existing boundary data
    bry1 = bry0.replace(zeta_west=jnp.full_like(bry0.zeta_west, 0.5))
    bry2, _ = set_tides(td, t, cfg, bry1)
    np.testing.assert_allclose(np.asarray(bry2.zeta_west),
                               zw_expect + 0.5, rtol=1e-9, atol=1e-12)


def test_periodicity():
    cfg = obc_basin.config("radiating", ntimes=1)
    td = _tides(cfg, pot=False)
    period = 2 * np.pi / float(td.ftide[0])
    b1, _ = set_tides(td.replace(ftide=td.ftide[:1],
                                 ztide_re=td.ztide_re[:1],
                                 ztide_im=td.ztide_im[:1],
                                 utide_re=td.utide_re[:1],
                                 utide_im=td.utide_im[:1],
                                 vtide_re=td.vtide_re[:1],
                                 vtide_im=td.vtide_im[:1]),
                      0.0, cfg, zero_boundary(cfg))
    b2, _ = set_tides(td.replace(ftide=td.ftide[:1],
                                 ztide_re=td.ztide_re[:1],
                                 ztide_im=td.ztide_im[:1],
                                 utide_re=td.utide_re[:1],
                                 utide_im=td.utide_im[:1],
                                 vtide_re=td.vtide_re[:1],
                                 vtide_im=td.vtide_im[:1]),
                      period, cfg, zero_boundary(cfg))
    np.testing.assert_allclose(np.asarray(b1.zeta_north),
                               np.asarray(b2.zeta_north), atol=1e-10)
