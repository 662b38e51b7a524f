"""Equivalence of the fused Pallas tracer-stage kernel against the jnp
engine (interpret mode on CPU; on TPU the same kernel compiles via
Mosaic).  The jnp path is the correctness anchor — it carries the f64
oracle regressions — so the kernel must reproduce it to round-off on
every scheme/mode/masking combination it claims to cover."""

import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from roms_tpu.config import AdvScheme, ModelConfig
from roms_tpu.ops import advection as adv
from roms_tpu.ops import pallas_tracer, vmix

NX, NY, NZ, NT = 24, 18, 10, 3


def _setup(dtype, ew_periodic=False, ns_periodic=False, masking=True,
           seed=0):
    cfg = ModelConfig(nx=NX, ny=NY, nz=NZ, nt=NT, salinity=True,
                      masking=masking, ew_periodic=ew_periodic,
                      ns_periodic=ns_periodic)
    jy, ix = NY + 4, NX + 4
    rng = np.random.default_rng(seed)
    r = lambda *sh: jnp.asarray(rng.standard_normal(sh), dtype)
    tk = 10.0 + r(NT, NZ, jy, ix)
    t_sec = 10.0 + r(NT, NZ, jy, ix)
    flx_u = 0.1 * r(NZ, jy, ix)
    flx_v = 0.1 * r(NZ, jy, ix)
    hz_n = 5.0 + 0.5 * r(NZ, jy, ix)
    hz_d = 0.01 * r(NZ, jy, ix)               # pred: flx_div; corr: Hz(n+1)
    hz_new = hz_n + 0.1 * r(NZ, jy, ix)
    we = 0.05 * r(NZ + 1, jy, ix)
    wi = 0.05 * r(NZ + 1, jy, ix)
    akt = 0.001 + 0.0005 * jnp.abs(r(2, NZ + 1, jy, ix))
    pmn = jnp.asarray(1e-3 * (1.0 + 0.1 * rng.standard_normal((jy, ix))),
                      dtype)
    rmask = jnp.asarray((rng.random((jy, ix)) > 0.15).astype(np.float64),
                        dtype)
    umask = rmask * jnp.roll(rmask, 1, axis=1)
    vmask = rmask * jnp.roll(rmask, 1, axis=0)
    stflx = 0.01 * r(NT, jy, ix)
    grid = types.SimpleNamespace(umask=umask, vmask=vmask,
                                 own_w=None, own_e=None, own_s=None,
                                 own_n=None)
    return (cfg, grid, tk, t_sec, flx_u, flx_v, hz_n, hz_d, hz_new,
            we, wi, akt, pmn, rmask, umask, vmask, stflx)


def _jnp_stage(cfg, grid, tk, t_sec, flx_u, flx_v, hz_pre, hz_spl, hz_imp,
               we, wi, akt, pmn, rmask, scheme, dtau, c_tk, c_sec,
               apply_mask, stflx=None):
    fx, fe = adv.horiz_tracer_flux(tk, flx_u, flx_v, grid, cfg, scheme)
    div = pmn[None] * (jnp.roll(fx, -1, axis=-1) - fx
                       + jnp.roll(fe, -1, axis=-2) - fe)
    rhs = hz_pre * (c_tk * tk + c_sec * t_sec) - dtau * div
    fc = jax.vmap(adv.vert_tracer_flux_spline, in_axes=(0, None, None))(
        tk, hz_spl, we)
    rhs = rhs - dtau * pmn[None] * (fc[:, 1:] - fc[:, :-1])
    if stflx is not None:
        rhs = rhs.at[:, -1].add(dtau * stflx)
    akt_b = vmix.gather_akt(akt, cfg)
    return vmix.tracer_implicit_all(rhs, hz_imp, akt_b, wi, pmn, dtau,
                                    rmask, cfg, apply_mask=apply_mask)


def _close(got, ref, cfg):
    """Compare the ring + interior (rows/cols >= 1).  The outermost ghost
    line may legitimately differ on non-periodic axes: the jnp path's
    roll-wrap garbage there duplicates the pre-fix elementary differences
    across the wrap seam, while the kernel applies the edge-extrapolation
    fix once.  Those ghost values are physically inert by construction —
    the extrapolation fixes (reference:
    compute_horiz_tracer_fluxes.h:74-83) exist precisely to decouple every
    ring/interior flux from the ghost line, and the BC kernels rewrite the
    ring each stage."""
    g = np.asarray(got)
    r = np.asarray(ref)
    if cfg.fully_periodic:
        sl = (Ellipsis,)
    else:
        sl = (Ellipsis, slice(1, -1), slice(1, -1))
    np.testing.assert_allclose(g[sl], r[sl], rtol=1e-12, atol=1e-12)


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(pallas_tracer, "_INTERPRET", True)


@pytest.mark.parametrize("scheme", [AdvScheme.UPSTREAM3,
                                    AdvScheme.CENTERED4, AdvScheme.AKIMA])
def test_corrector_stage_matches_jnp(scheme):
    (cfg, grid, tk, t_sec, flx_u, flx_v, hz_n, _, hz_new, we, wi, akt,
     pmn, rmask, umask, vmask, stflx) = _setup(jnp.float64)
    dtau = 60.0
    ref = _jnp_stage(cfg, grid, tk, t_sec, flx_u, flx_v, hz_n, hz_new,
                     hz_new, we, wi, akt, pmn, rmask, scheme, dtau,
                     0.0, 1.0, True, stflx=stflx)
    got = pallas_tracer.tracer_stage(
        tk, t_sec, flx_u, flx_v, hz_n, hz_new, we, wi, akt, pmn, rmask,
        umask, vmask, cfg, scheme, dtau, 0.0, 1.0, True, "corr",
        stflx=stflx)
    _close(got, ref, cfg)


@pytest.mark.parametrize("periodic", [False, True])
def test_predictor_stage_matches_jnp(periodic):
    (cfg, grid, tk, t_sec, flx_u, flx_v, hz_n, hz_d, _, we, wi, akt,
     pmn, rmask, umask, vmask, _st) = _setup(
        jnp.float64, ew_periodic=periodic, ns_periodic=periodic)
    dtau = 50.0
    c_tk, c_sec = 0.5 + 1.0 / 6.0, 0.5 - 1.0 / 6.0
    hz_bak = hz_n + hz_d
    hz_fwd = hz_n - hz_d
    ref = _jnp_stage(cfg, grid, tk, t_sec, flx_u, flx_v, hz_bak, hz_n,
                     hz_fwd, we, wi, akt, pmn, rmask,
                     AdvScheme.CENTERED4, dtau, c_tk, c_sec, False)
    got = pallas_tracer.tracer_stage(
        tk, t_sec, flx_u, flx_v, hz_n, hz_d, we, wi, akt, pmn, rmask,
        umask, vmask, cfg, AdvScheme.CENTERED4, dtau, c_tk, c_sec,
        False, "pred")
    _close(got, ref, cfg)


def test_nondivisible_jy_padding():
    """jy not a multiple of the block: the row-padded launch must still
    agree on the real rows."""
    (cfg, grid, tk, t_sec, flx_u, flx_v, hz_n, _, hz_new, we, wi, akt,
     pmn, rmask, umask, vmask, stflx) = _setup(jnp.float64)
    # NY+4 = 22 -> not a multiple of BJ=8 (pads to 24)
    assert (NY + 4) % pallas_tracer.BJ != 0
    ref = _jnp_stage(cfg, grid, tk, t_sec, flx_u, flx_v, hz_n, hz_new,
                     hz_new, we, wi, akt, pmn, rmask,
                     AdvScheme.UPSTREAM3, 60.0, 0.0, 1.0, True)
    got = pallas_tracer.tracer_stage(
        tk, t_sec, flx_u, flx_v, hz_n, hz_new, we, wi, akt, pmn, rmask,
        umask, vmask, cfg, AdvScheme.UPSTREAM3, 60.0, 0.0, 1.0, True,
        "corr")
    _close(got, ref, cfg)


def test_full_step_matches_jnp(monkeypatch):
    """The whole baroclinic step with the fused tracer stage must match
    the jnp step on a production-like config (KPP + split EOS + masking +
    4-side OBC + passive tracers) to round-off over several steps."""
    import roms_tpu.stepper as stepper_mod
    from roms_tpu.cases import bench_production
    from roms_tpu.ops.weights import set_weights
    from roms_tpu.parallel.halo import make_halo_fill

    cfg = bench_production.config(nx=28, ny=20, nz=8, nt=4)
    grid, st0, frc = bench_production.setup(cfg, dtype=jnp.float64)
    w1, w2, _ = set_weights(cfg.ndtfast)
    w1 = jnp.asarray(w1, jnp.float64)
    w2 = jnp.asarray(w2, jnp.float64)
    halo = make_halo_fill(cfg)

    def run(force_pallas):
        monkeypatch.setattr(stepper_mod, "_use_pallas_tracer",
                            lambda c, s, h: force_pallas)
        s = st0
        for i in range(3):
            s = stepper_mod.step_impl(s, frc, grid, w1, w2, cfg,
                                      first_step=(i == 0), halo=halo)
        return s

    ref = run(False)
    got = run(True)
    # FULL arrays, ghosts included: the halo fill ring-replicates and the
    # BC kernels rewrite the ring each stage, so both paths' ghost lines
    # are deterministic and identical (parallel/halo.py mixed_fill)
    for name in ("t", "zeta", "u", "v", "hz", "hbls"):
        a = np.asarray(getattr(ref, name))
        b = np.asarray(getattr(got, name))
        scale = max(1.0, np.abs(a).max())
        np.testing.assert_allclose(b, a, atol=5e-11 * scale, rtol=0,
                                   err_msg=name)


def test_corrector_with_fused_t3dmix_matches_jnp():
    """mix=: the in-kernel t3dmix tendency must equal the jnp epilogue's
    separate hmix.t3dmix pass applied after the solve (reference:
    t3dmix_S.F called right after step3d_t, main.F:469-475)."""
    from roms_tpu.ops.hmix import t3dmix

    (cfg, grid, tk, t_sec, flx_u, flx_v, hz_n, _, hz_new, we, wi, akt,
     pmn, rmask, umask, vmask, stflx) = _setup(jnp.float64)
    grid.pmon_u = jnp.asarray(
        1.0 + 0.1 * np.random.default_rng(7).standard_normal(pmn.shape))
    grid.pnom_v = jnp.asarray(
        1.0 + 0.1 * np.random.default_rng(8).standard_normal(pmn.shape))
    grid.h = jnp.zeros_like(pmn)
    diff2 = jnp.asarray(
        0.5 + 0.1 * np.abs(np.random.default_rng(9).standard_normal(
            (NT,) + pmn.shape)))
    dtau = 60.0

    ref = _jnp_stage(cfg, grid, tk, t_sec, flx_u, flx_v, hz_n, hz_new,
                     hz_new, we, wi, akt, pmn, rmask,
                     AdvScheme.UPSTREAM3, dtau, 0.0, 1.0, True,
                     stflx=stflx)

    gmix = types.SimpleNamespace(pmon_u=grid.pmon_u, pnom_v=grid.pnom_v,
                                 umask=umask, vmask=vmask,
                                 pm=jnp.sqrt(pmn), pn=jnp.sqrt(pmn))
    cfg_mix = cfg.replace(dt=dtau)
    ref = t3dmix(ref, tk, hz_new, gmix, cfg_mix, diff2=diff2)

    got = pallas_tracer.tracer_stage(
        tk, t_sec, flx_u, flx_v, hz_n, hz_new, we, wi, akt, pmn, rmask,
        umask, vmask, cfg, AdvScheme.UPSTREAM3, dtau, 0.0, 1.0, True,
        "corr", stflx=stflx,
        mix={"diff2": diff2, "pmon_u": grid.pmon_u,
             "pnom_v": grid.pnom_v})
    _close(got, ref, cfg)
