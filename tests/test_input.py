"""Grid/init file roundtrip: write a grid + history file, read them back
into a new Grid/OceanState (reference: src/grid.F get_grid,
src/get_init.F)."""

import numpy as np

from roms_tpu.cases import filament
from roms_tpu.io import (HistoryWriter, read_grid, read_init, write_grid)


def test_grid_roundtrip(tmp_path):
    cfg = filament.config().replace(nx=16, ny=12, nz=8)
    grid, st, forcing = filament.setup(cfg)
    p = str(tmp_path / "grd.nc")
    write_grid(p, grid, cfg)

    g2 = read_grid(p, cfg)
    h = cfg.halo
    intr = (slice(h, -h), slice(h, -h))
    np.testing.assert_array_equal(np.asarray(g2.h)[intr],
                                  np.asarray(grid.h)[intr])
    np.testing.assert_array_equal(np.asarray(g2.pm)[intr],
                                  np.asarray(grid.pm)[intr])
    # derived metrics agree in the interior
    np.testing.assert_allclose(np.asarray(g2.dn_u)[intr],
                               np.asarray(grid.dn_u)[intr], rtol=1e-14)


def test_init_roundtrip(tmp_path):
    cfg = filament.config().replace(nx=16, ny=12, nz=8)
    grid, st, forcing = filament.setup(cfg)
    p = str(tmp_path / "his.nc")
    hw = HistoryWriter(p, grid, cfg, dtype="f8")
    hw.write(st)
    hw.close()

    st2 = read_init(p, cfg, grid, record=0)
    h = cfg.halo
    intr = (slice(h, -h), slice(h, -h))
    np.testing.assert_allclose(np.asarray(st2.zeta)[intr],
                               np.asarray(st.zeta)[intr], atol=1e-12)
    np.testing.assert_allclose(np.asarray(st2.t[0])[(slice(None),) + intr],
                               np.asarray(st.t[0])[(slice(None),) + intr],
                               atol=1e-12)
    # u on the staggered grid: interior u points (py 3..-3) are preserved
    uin = (slice(None), slice(h, -h), slice(h + 1, -h))
    np.testing.assert_allclose(np.asarray(st2.u)[uin],
                               np.asarray(st.u)[uin], atol=1e-12)
    np.testing.assert_allclose(np.asarray(st2.hz)[(slice(None),) + intr],
                               np.asarray(st.hz)[(slice(None),) + intr],
                               atol=1e-12)
