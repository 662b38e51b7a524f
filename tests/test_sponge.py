"""Sponge-layer tests (reference: src/set_nudgcof.F)."""

import numpy as np

from roms_tpu.cases import obc_basin
from roms_tpu.sponge import set_nudgcof, sponge_profile


def test_profile_shape():
    cfg = obc_basin.config("radiating", ntimes=1).replace(
        sponge=True, v_sponge=100.0)
    w = sponge_profile(cfg)
    h = cfg.halo
    isp = cfg.sponge_size + 1
    # center of the domain: fully interior -> 0
    assert w[cfg.ny // 2 + h, cfg.nx // 2 + h] == 0.0
    # boundary ring (Fortran i=0 -> py 1): ibnd=0 -> profile = 1
    assert w[cfg.ny // 2 + h, 1] == 1.0
    # one point in: (isp-1)/isp
    np.testing.assert_allclose(w[cfg.ny // 2 + h, 2], (isp - 1) / isp)
    # monotone decay inward
    row = w[cfg.ny // 2 + h, 1:h + isp + 1]
    assert (np.diff(row) <= 0).all()


def test_west_only():
    cfg = obc_basin.config("radiating", ntimes=1).replace(
        obc_east=False, obc_south=False, obc_north=False,
        sponge=True, v_sponge=50.0)
    w = sponge_profile(cfg)
    h = cfg.halo
    assert w[cfg.ny // 2 + h, 1] == 1.0
    assert w[cfg.ny // 2 + h, -2] == 0.0   # east edge untouched
    assert w[1, cfg.nx // 2 + h] == 0.0    # south edge untouched


def test_set_nudgcof_coefficients():
    cfg = obc_basin.config("radiating", ntimes=1).replace(
        sponge=True, v_sponge=200.0, visc2=10.0, tnu2=5.0)
    grid, _, _ = obc_basin.setup(cfg)
    g2 = set_nudgcof(grid, cfg)
    vr = np.asarray(g2.visc2_r)
    d2 = np.asarray(g2.diff2)
    h = cfg.halo
    # interior: base values
    np.testing.assert_allclose(vr[cfg.ny // 2 + h, cfg.nx // 2 + h], 10.0)
    np.testing.assert_allclose(d2[0, cfg.ny // 2 + h, cfg.nx // 2 + h], 5.0)
    # boundary ring: base + v_sponge
    np.testing.assert_allclose(vr[cfg.ny // 2 + h, 1], 210.0)
    np.testing.assert_allclose(d2[0, cfg.ny // 2 + h, 1], 205.0)
    assert d2.shape[0] == cfg.nt
