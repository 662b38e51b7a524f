"""Equivalence of the Pallas momentum implicit solve against the jnp
scan path (interpret mode on CPU; compiled via Mosaic on TPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from roms_tpu.config import ModelConfig
from roms_tpu.ops import pallas_solve, vmix

NX, NY, NZ = 24, 18, 10


def _setup(seed=0):
    cfg = ModelConfig(nx=NX, ny=NY, nz=NZ)
    jy, ix = NY + 4, NX + 4
    rng = np.random.default_rng(seed)
    r = lambda *sh: jnp.asarray(rng.standard_normal(sh), jnp.float64)
    rhs = r(NZ, jy, ix)
    hzf = 5.0 + 0.5 * jnp.abs(r(NZ, jy, ix))
    akvf = 1e-3 + 1e-4 * jnp.abs(r(NZ + 1, jy, ix))
    wif = 0.01 * r(NZ + 1, jy, ix)
    dc0 = 1e-4 * (1.0 + 0.1 * jnp.abs(r(jy, ix)))
    sstr = 1e-4 * r(jy, ix)
    rd = 1e-4 * jnp.abs(r(jy, ix))
    return cfg, rhs, hzf, akvf, wif, dc0, sstr, rd


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(pallas_solve, "_INTERPRET", True)


@pytest.mark.parametrize("drag", [True, False])
def test_momentum_implicit_matches_jnp(drag):
    cfg, rhs, hzf, akvf, wif, dc0, sstr, rd = _setup()
    dtau = 200.0
    kw = dict(bottom_drag_coeff=rd if drag else None)
    ref = vmix.momentum_implicit(rhs, hzf, akvf, wif, dc0, dtau, sstr,
                                 cfg, **kw)
    got = pallas_solve.momentum_implicit(rhs, hzf, akvf, wif, dc0, dtau,
                                         sstr, cfg, **kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-12, atol=1e-12)
