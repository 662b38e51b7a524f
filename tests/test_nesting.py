"""r2r nesting-tool tests (reference: Tools-Roms/r2r_bry.F, r2r_init.F)
plus the coarse2fine forcing refinement
(reference: roms_read_write.F:1210-1273)."""

import numpy as np

from roms_tpu.forcing import coarse2fine
from roms_tpu.io import open_dataset
from roms_tpu.tools.nesting import (child_boundary_from_parent, interp_at,
                                    locate_in_grid, remap_columns)


def test_locate_in_grid_uniform():
    ny, nx = 20, 30
    lon = np.linspace(0.0, 29.0, nx)[None, :].repeat(ny, 0)
    lat = np.linspace(0.0, 19.0, ny)[:, None].repeat(nx, 1)
    px, py = locate_in_grid(lon, lat, [3.5, 17.25], [2.0, 11.75])
    np.testing.assert_allclose(px, [3.5, 17.25], atol=1e-10)
    np.testing.assert_allclose(py, [2.0, 11.75], atol=1e-10)


def test_locate_in_grid_rotated():
    # 30-degree rotated curvilinear grid
    ny, nx = 16, 16
    i = np.arange(nx)[None, :].repeat(ny, 0).astype(float)
    j = np.arange(ny)[:, None].repeat(nx, 1).astype(float)
    th = np.pi / 6
    lon = np.cos(th) * i - np.sin(th) * j
    lat = np.sin(th) * i + np.cos(th) * j
    # target at (i,j) = (5.5, 7.25)
    lt = np.cos(th) * 5.5 - np.sin(th) * 7.25
    la = np.sin(th) * 5.5 + np.cos(th) * 7.25
    px, py = locate_in_grid(lon, lat, [lt], [la])
    np.testing.assert_allclose(px, [5.5], atol=1e-8)
    np.testing.assert_allclose(py, [7.25], atol=1e-8)


def test_coarse2fine_bilinear():
    nyc, nxc = 8, 10
    c = np.arange(nyc * nxc, dtype=float).reshape(nyc, nxc)
    f = coarse2fine(c, ratio=2, gtype="r")
    assert f.shape == (16, 20)
    # a linear field is reproduced exactly away from the edges
    # (coarse field is linear in indices -> bilinear interp exact)
    ic = np.arange(1, 21) / 2 + 0.25 - 1.0
    jc = np.arange(1, 17) / 2 + 0.25 - 1.0
    ic_c = np.clip(ic, 0, nxc - 1)
    jc_c = np.clip(jc, 0, nyc - 1)
    expect = jc_c[:, None] * nxc + ic_c[None, :]
    np.testing.assert_allclose(f, expect, atol=1e-12)


def test_child_boundary_roundtrip(tmp_path):
    # parent: uniform lon/lat grid with analytic fields
    ny, nx, nzp, nrec = 24, 30, 8, 2
    lon = np.linspace(0.0, 29.0, nx)[None, :].repeat(ny, 0)
    lat = np.linspace(0.0, 23.0, ny)[:, None].repeat(nx, 1)
    hz = np.full((nzp, ny, nx), 100.0 / nzp)
    zeta = np.stack([0.1 * lon / 29.0, 0.2 * lat / 23.0])
    ubar = np.full((nrec, ny, nx), 0.3)
    vbar = np.zeros((nrec, ny, nx))
    # temp varies linearly with longitude, uniform in depth
    temp = np.broadcast_to(15.0 + lon / 29.0,
                           (nrec, nzp, ny, nx)).copy()
    parent = dict(lon=lon, lat=lat, hz=hz, zeta=zeta, ubar=ubar,
                  vbar=vbar, temp=temp)

    nzc, npts = 5, 7
    child = {"west": dict(lon=np.full(npts, 10.25),
                          lat=np.linspace(5.0, 11.0, npts),
                          hz=np.full((nzc, npts), 100.0 / nzc))}
    p = str(tmp_path / "bry.nc")
    child_boundary_from_parent(parent, child, p, tracer_names=("temp",),
                               times=np.array([0.0, 3600.0]))

    with open_dataset(p) as ds:
        z = ds["zeta_west"][0]
        np.testing.assert_allclose(z, 0.1 * 10.25 / 29.0, atol=1e-10)
        t = ds["temp_west"][0]
        assert t.shape == (nzc, npts)
        # uniform-in-depth tracer: conservative remap keeps the value
        np.testing.assert_allclose(t, 15.0 + 10.25 / 29.0, rtol=1e-9)
        np.testing.assert_allclose(ds["ubar_west"][1], 0.3, atol=1e-12)


def test_match_topo_blends_at_open_edges():
    """r2r_match_topo equivalent (reference: Tools-Roms/r2r_match_topo.F):
    child h equals parent h exactly at the open boundary, untouched in
    the interior, smooth in between, and land-blocked areas don't merge."""
    from roms_tpu.tools.nesting import match_topo

    ny, nx = 40, 50
    h_c = np.full((ny, nx), 100.0)
    h_p = np.full((ny, nx), 200.0)
    m = np.ones((ny, nx))
    out = match_topo(h_c, h_p, m, edges=("west",), width=10)
    np.testing.assert_allclose(out[:, 0], 200.0)       # exact at boundary
    np.testing.assert_allclose(out[:, 15:], 100.0)     # interior untouched
    assert 100.0 < out[20, 5] < 200.0                  # smooth blend
    assert np.all(np.diff(out[20, :12]) <= 1e-9)       # monotone ramp

    # a land wall at i=3 blocks the merging zone behind it
    m2 = m.copy()
    m2[10:30, 3] = 0.0
    out2 = match_topo(h_c, h_p, m2, edges=("west",), width=10)
    assert abs(out2[20, 5] - 100.0) < abs(out[20, 5] - 100.0) - 1e-9
