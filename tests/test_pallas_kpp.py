"""Equivalence of the fused Pallas vmix (interior + KPP) kernel against
the jnp path (interpret mode on CPU; on TPU the same kernel compiles via
Mosaic).  The jnp path is the correctness anchor — it carries the f64
oracle regressions — so the kernel must reproduce it to round-off."""

import types

import jax.numpy as jnp
import numpy as np
import pytest

from roms_tpu.config import ModelConfig
from roms_tpu.ops import kpp, pallas_kpp

NX, NY, NZ = 24, 18, 10


def _setup(salinity=True, masking=True, seed=0, ew_periodic=False,
           ns_periodic=False):
    cfg = ModelConfig(nx=NX, ny=NY, nz=NZ, nt=2 if salinity else 1,
                      salinity=salinity, masking=masking, lmd_kpp=True,
                      nonlin_eos=True, ew_periodic=ew_periodic,
                      ns_periodic=ns_periodic)
    jy, ix = NY + 4, NX + 4
    rng = np.random.default_rng(seed)
    r = lambda *sh: jnp.asarray(rng.standard_normal(sh), jnp.float64)

    hz = 5.0 + 0.5 * jnp.abs(r(NZ, jy, ix))
    z_w = jnp.concatenate(
        [jnp.zeros((1, jy, ix)), jnp.cumsum(hz, axis=0)], axis=0)
    z_w = z_w - z_w[-1]                       # z_w[nz] = 0 (surface)
    z_r = 0.5 * (z_w[1:] + z_w[:-1])
    u = 0.1 * r(NZ, jy, ix)
    v = 0.1 * r(NZ, jy, ix)
    bvf = 1e-5 * r(NZ + 1, jy, ix)            # mixed-sign stratification
    t = jnp.stack([15.0 + r(NZ, jy, ix)]
                  + ([35.0 + 0.1 * r(NZ, jy, ix)] if salinity else []),
                  axis=0)
    swrf = jnp.clip(0.05 + jnp.abs(r(NZ + 1, jy, ix)), 0.0, 1.0)
    nt = t.shape[0]
    forcing = types.SimpleNamespace(
        stflx=1e-5 * r(nt, jy, ix), srflx=1e-5 * jnp.abs(r(jy, ix)),
        sustr=1e-4 * r(jy, ix), svstr=1e-4 * r(jy, ix))
    rmask = jnp.asarray((rng.random((jy, ix)) > 0.15).astype(np.float64))
    grid = types.SimpleNamespace(
        f=jnp.asarray(8e-5 + 1e-6 * rng.standard_normal((jy, ix))),
        rmask=rmask, umask=rmask * jnp.roll(rmask, 1, axis=1),
        vmask=rmask * jnp.roll(rmask, 1, axis=0),
        own_w=None, own_e=None, own_s=None, own_n=None)
    state = types.SimpleNamespace(
        swrf=swrf, hbls=20.0 + jnp.abs(r(jy, ix)),
        hbbl=5.0 + jnp.abs(r(jy, ix)))
    return cfg, grid, state, forcing, u, v, t, bvf, z_r, z_w, hz


def _jnp_vmix(cfg, grid, state, forcing, u, v, t, bvf, z_r, z_w, hz,
              first_step):
    kv, kt, ks = kpp.interior_mix(u, v, bvf, z_r, z_w, grid, cfg)
    return kpp.lmd_kpp(u, v, t, bvf, z_r, z_w, hz, kv, kt, ks, state.swrf,
                       forcing, state.hbls, state.hbbl, grid, cfg,
                       first_step)


def _compare(got, ref):
    sl = (Ellipsis, slice(1, -1), slice(1, -1))
    for name in ("akv", "akt", "hbls", "hbbl", "ghat"):
        g = np.asarray(getattr(got, name))[sl]
        r = np.asarray(getattr(ref, name))[sl]
        scale = max(1.0, np.abs(r).max())
        np.testing.assert_allclose(g, r, rtol=1e-12, atol=1e-12 * scale,
                                   err_msg=name)


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(pallas_kpp, "_INTERPRET", True)


@pytest.mark.parametrize("first_step", [True, False])
@pytest.mark.parametrize("salinity", [True, False])
def test_vmix_matches_jnp(salinity, first_step):
    cfg, grid, state, forcing, u, v, t, bvf, z_r, z_w, hz = _setup(
        salinity=salinity)
    ref = _jnp_vmix(cfg, grid, state, forcing, u, v, t, bvf, z_r, z_w, hz,
                    first_step)
    got = pallas_kpp.vmix_update(state, u, v, t, bvf, z_r, z_w, hz,
                                 forcing, grid, cfg, first_step)
    _compare(got, ref)


def test_vmix_matches_jnp_nomask():
    cfg, grid, state, forcing, u, v, t, bvf, z_r, z_w, hz = _setup(
        masking=False, seed=3)
    ref = _jnp_vmix(cfg, grid, state, forcing, u, v, t, bvf, z_r, z_w, hz,
                    False)
    got = pallas_kpp.vmix_update(state, u, v, t, bvf, z_r, z_w, hz,
                                 forcing, grid, cfg, False)
    _compare(got, ref)


def test_vmix_matches_jnp_periodic():
    cfg, grid, state, forcing, u, v, t, bvf, z_r, z_w, hz = _setup(
        ew_periodic=True, ns_periodic=True, seed=5)
    ref = _jnp_vmix(cfg, grid, state, forcing, u, v, t, bvf, z_r, z_w, hz,
                    False)
    got = pallas_kpp.vmix_update(state, u, v, t, bvf, z_r, z_w, hz,
                                 forcing, grid, cfg, False)
    _compare(got, ref)
