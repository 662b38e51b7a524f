"""Lagrangian particle tests (reference: src/particles.F).

Analytic checks: uniform flow advects particles at exactly u*dt/dx index
units per step (after the AB2 start), periodic wrap, vertical clamping,
and trajectory output roundtrip.
"""

import numpy as np
import jax.numpy as jnp

from roms_tpu.cases import filament
from roms_tpu.particles import (ParticleState, ParticleWriter,
                                advance_particles, seed_particles)


def _fields(cfg, u0=0.2, v0=0.0, w0=0.0):
    grid, st, forcing = filament.setup(cfg)
    u = jnp.full_like(st.u, u0)
    v = jnp.full_like(st.v, v0)
    we = jnp.full_like(st.we, w0 / np.asarray(grid.pm)[3, 3] ** 2)
    wi = jnp.zeros_like(st.wi)
    return grid, st, u, v, we, wi


def test_uniform_flow_advection():
    cfg = filament.config(ntimes=1).replace(nx=16, ny=16, nz=8)
    grid, st, u, v, we, wi = _fields(cfg, u0=0.2)
    dx = 1.0 / float(np.asarray(grid.pm)[3, 3])
    ps = seed_particles([4.0, 8.0], [6.0, 6.0], [4.0, 4.0])

    nsteps = 5
    for _ in range(nsteps):
        ps = advance_particles(ps, u, v, we, wi, st.hz, grid, cfg)
    expect = 4.0 + nsteps * 0.2 * cfg.dt / dx
    np.testing.assert_allclose(np.asarray(ps.px)[0], expect, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(ps.py)[0], 6.0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(ps.pz)[0], 4.0, atol=1e-12)
    assert bool(ps.active[0])


def test_periodic_wrap():
    cfg = filament.config(ntimes=1).replace(nx=16, ny=16, nz=8)
    grid, st, u, v, we, wi = _fields(cfg, u0=5.0)
    ps = seed_particles([15.0], [6.0], [4.0])
    for _ in range(20):
        ps = advance_particles(ps, u, v, we, wi, st.hz, grid, cfg)
    px = float(ps.px[0])
    assert -0.5 <= px < cfg.nx + 0.5
    assert bool(ps.active[0])


def test_vertical_clamp_counters():
    cfg = filament.config(ntimes=1).replace(nx=16, ny=16, nz=8)
    grid, st, u, v, we, wi = _fields(cfg, u0=0.0)
    # strong downward velocity: Wp = We*pm*pn must overcome Hz ~ 125 m,
    # so We must be large (it is a volume flux, not a velocity)
    we = jnp.full_like(st.we, -1.0e7)
    ps = seed_particles([6.0], [6.0], [1.0])
    for _ in range(10):
        ps = advance_particles(ps, u, v, we, wi, st.hz, grid, cfg)
    # the clamp resets to 0.02 whenever pz crosses below 0
    # (reference: particles.F:252-256), so pz never goes negative
    assert float(ps.pz[0]) > 0.0
    assert int(ps.n_bot) > 0


def test_inactive_capacity_and_writer(tmp_path):
    cfg = filament.config(ntimes=1).replace(nx=16, ny=16, nz=8)
    grid, st, u, v, we, wi = _fields(cfg, u0=0.1)
    ps = seed_particles([4.0], [4.0], [4.0], npart_max=8)
    assert int(ps.active.sum()) == 1
    ps2 = advance_particles(ps, u, v, we, wi, st.hz, grid, cfg)
    # inactive slots do not move
    np.testing.assert_array_equal(np.asarray(ps2.px)[1:],
                                  np.zeros(7))

    p = str(tmp_path / "part.nc")
    pw = ParticleWriter(p, 8, cfg)
    pw.write(ps2, 60.0)
    pw.close()
    from roms_tpu.io import open_dataset
    with open_dataset(p) as ds:
        assert ds["px"].shape == (1, 8)
        np.testing.assert_allclose(ds["px"][0], np.asarray(ps2.px))
