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


def test_distributed_particles_match_single():
    """Cross-shard particle stepping (reference: particles.F:935-1010
    8-neighbor migration): the replicated-particles + owner-block-gather
    + psum design must reproduce the single-device trajectories through
    block seams."""
    import jax
    import pytest

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")

    from roms_tpu.cases import obc_basin
    from roms_tpu.ops.weights import set_weights
    from roms_tpu.parallel.dist import (make_distributed_step, make_mesh,
                                        to_blocked)
    from roms_tpu.particles import (advance_particles,
                                    make_distributed_particle_step,
                                    seed_particles)
    from roms_tpu.stepper import step

    cfg = obc_basin.config("inflow").replace(nx=32, ny=16, nz=6,
                                             dt=120.0, ndtfast=20)
    grid, st, frc = obc_basin.setup(cfg, inflow_u=0.2, t_inflow=2.0)
    # particles straddling future block seams (mesh 2x4 -> seams at
    # x = 8,16,24 and y = 8)
    px = jnp.asarray([6.0, 7.8, 15.9, 23.7, 28.0])
    py = jnp.asarray([7.9, 8.2, 7.5, 9.0, 4.0])
    pz = jnp.asarray([5.0, 4.0, 3.0, 2.5, 5.5])
    ps1 = seed_particles(px, py, pz)
    ps8 = seed_particles(px, py, pz)

    mesh = make_mesh(8)
    w1, w2, _ = set_weights(cfg.ndtfast)
    w1 = jnp.asarray(w1, jnp.float64)
    w2 = jnp.asarray(w2, jnp.float64)
    st_b = to_blocked(st, mesh, cfg.halo)
    frc_b = to_blocked(frc, mesh, cfg.halo)
    grid_b = to_blocked(grid, mesh, cfg.halo)
    dstep_f, dstep_r = make_distributed_step(cfg, mesh)
    pstep = make_distributed_particle_step(cfg, mesh)

    s1 = st
    sb = st_b
    for i in range(4):
        s1 = step(s1, frc, grid, w1, w2, cfg, first_step=(i == 0))
        sb = (dstep_f if i == 0 else dstep_r)(sb, frc_b, grid_b, w1, w2)
        ps1 = advance_particles(ps1, s1.u, s1.v, s1.we, s1.wi, s1.hz,
                                grid, cfg)
        ps8 = pstep(ps8, sb.u, sb.v, sb.we, sb.wi, sb.hz, grid_b)
    for f in ("px", "py", "pz"):
        np.testing.assert_allclose(np.asarray(getattr(ps8, f)),
                                   np.asarray(getattr(ps1, f)),
                                   rtol=0, atol=1e-11, err_msg=f)
    assert bool(np.all(np.asarray(ps8.active) == np.asarray(ps1.active)))
