"""One baroclinic time step: LF-AM3 predictor/corrector with the
forward-backward barotropic sub-cycle (reference: src/main.F:333-520,
roms_step; predictor src/pre_step3d4S.F; corrector src/step3d_uv1.F,
src/step3d_uv2.F, src/step3d_t_ISO.F).

The whole function is pure `state -> state` and JIT-compiles into a single
XLA program; `first_step` is a static flag selecting the startup coefficient
regime (RK2-like start, reference: pre_step3d4S.F:126-134,
set_global_definitions.h:328-342 FIRST_TIME_STEP).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from roms_tpu.config import ModelConfig
from roms_tpu.grid import Grid
from roms_tpu.ops import advection as adv
from roms_tpu.ops import barotropic, bc, eos, kinematics, vmix
from roms_tpu.ops import prsgrd as prsgrd_mod
from roms_tpu.ops import rivers as rivers_mod
from roms_tpu.ops.kinematics import hz_u, hz_v
from roms_tpu.parallel.halo import make_halo_fill, shift
from roms_tpu.state import Forcing, OceanState
from roms_tpu import vcoord

AM3_CRV = 1.0 / 6.0  # (reference: pre_step3d4S.F:83)


def _uv_rhs(u, v, flx_u, flx_v, hz, we, grid, cfg: ModelConfig, scheme,
            parts: bool = False):
    """Coriolis + horizontal + vertical momentum advection r.h.s. additions
    (reference: compute_horiz_rhs_uv_terms.h + compute_vert_rhs_uv_terms.h).

    With parts=True also returns the (cori_u, cori_v, adv_u, adv_v) split
    for the momentum budget (reference: diagnostics.F icori/iadv)."""
    ru = jnp.zeros_like(u)
    rv = jnp.zeros_like(v)
    rc_u = rc_v = None
    if cfg.uv_cor or (cfg.curvgrid and cfg.uv_adv):
        rc_u, rc_v = adv.coriolis_rhs(u, v, hz, grid, cfg)
        ru = ru + rc_u
        rv = rv + rc_v
    if cfg.uv_adv:
        ra_u, ra_v = adv.horiz_uv_adv_rhs(u, v, flx_u, flx_v, grid, cfg,
                                          scheme)
        ru = ru + ra_u
        rv = rv + ra_v
        ru = ru + adv.vert_uv_rhs_spline(u, hz, we, grid.umask, grid, cfg, "u")
        rv = rv + adv.vert_uv_rhs_spline(v, hz, we, grid.vmask, grid, cfg, "v")
    if parts:
        zc_u = rc_u if rc_u is not None else jnp.zeros_like(u)
        zc_v = rc_v if rc_v is not None else jnp.zeros_like(v)
        return ru, rv, zc_u, zc_v
    return ru, rv


def _tracer_divergence(fx, fe, pmn):
    return pmn[None] * (shift(fx, 0, 1) - fx + shift(fe, 1, 0) - fe)


def _vmix_update(state, u, v, t, bvf, z_r, z_w, hz, forcing, grid,
                 cfg: ModelConfig, first_step: bool, halo=None):
    """lmd_vmix + lmd_kpp at one time level (reference: main.F:408-410,
    :434-436; src/lmd_vmix.F + src/lmd_kpp.F)."""
    from roms_tpu.ops import kpp
    if _use_pallas_kpp(cfg, state, halo):
        from roms_tpu.ops import pallas_kpp
        return pallas_kpp.vmix_update(state, u, v, t, bvf, z_r, z_w, hz,
                                      forcing, grid, cfg, first_step)
    kv, kt, ks = kpp.interior_mix(u, v, bvf, z_r, z_w, grid, cfg)
    out = kpp.lmd_kpp(u, v, t, bvf, z_r, z_w, hz, kv, kt, ks, state.swrf,
                      forcing, state.hbls, state.hbbl, grid, cfg, first_step)
    return out


def _use_pallas_kpp(cfg: ModelConfig, state, halo) -> bool:
    """Gate for the fused Pallas vmix kernel: TPU f32 steps, single-block
    AND distributed (the edge fills are ownership-gated per shard; the
    f64 CPU oracle path keeps the jnp engine; interpret mode forces the
    kernel on for CPU equivalence tests)."""
    from roms_tpu.ops import pallas_kpp
    if not pallas_kpp.usable(cfg):
        return False
    if pallas_kpp._INTERPRET:
        return True
    return (jax.default_backend() == "tpu"
            and state.t.dtype == jnp.float32)


def _mom_implicit(halo, rhs, hz_face, akv_face, wi_face, dc0, dtau, sstr,
                  cfg: ModelConfig, bottom_drag_coeff=None):
    """Momentum implicit solve dispatcher: the Pallas column kernel on
    TPU f32 steps (column-pure — valid per-shard under shard_map too),
    the jnp scan path (f64 oracle) elsewhere."""
    from roms_tpu.ops import pallas_solve
    use = (pallas_solve._INTERPRET
           or (jax.default_backend() == "tpu"
               and rhs.dtype == jnp.float32))
    fn = pallas_solve.momentum_implicit if use else vmix.momentum_implicit
    return fn(rhs, hz_face, akv_face, wi_face, dc0, dtau, sstr, cfg,
              bottom_drag_coeff=bottom_drag_coeff)


def _use_pallas_tracer(cfg: ModelConfig, state, halo) -> bool:
    """Gate for the fused Pallas tracer stage: TPU f32 steps of coverable
    configurations, single-block AND distributed — inside shard_map each
    shard is a single padded block and the kernel applies the physical-
    edge fixes gated on the block's ownership flags (the f64 CPU oracle
    path keeps the jnp engine; interpret mode forces the kernel on for
    CPU equivalence tests)."""
    from roms_tpu.ops import pallas_tracer
    if not pallas_tracer.usable(cfg):
        return False
    if pallas_tracer._INTERPRET:
        return True
    return (jax.default_backend() == "tpu"
            and state.t.dtype == jnp.float32)


def step_impl(state: OceanState, forcing: Forcing, grid: Grid, w1, w2,
              cfg: ModelConfig, first_step: bool, halo) -> OceanState:
    """Un-jitted step body with a pluggable halo backend: single-block
    periodic wrap or `HaloExchange` (ppermute) inside shard_map."""
    pmn = grid.pm * grid.pn
    hz_n = state.hz            # grid-box heights at time n
    zw_n, zr_n = state.z_w, state.z_r
    akv, akt = state.akv, state.akt
    hbls, hbbl = state.hbls, state.hbbl
    ghat = None

    # surface flux restoring toward SST/SSS data (reference:
    # src/surf_flux.F:140-163 apply_surf_field_corr; QCORRECTION REPLACES
    # the heat flux, SFLX_CORR ADDS to the salt flux)
    if cfg.qcorrection and forcing.sst is not None:
        stflx = forcing.stflx.at[cfg.itemp].set(
            -cfg.dsstdt * (state.t[cfg.itemp, -1] - forcing.sst))
        forcing = forcing.replace(stflx=stflx)
    if cfg.sflx_corr and cfg.salinity and forcing.sss is not None:
        stflx = forcing.stflx.at[cfg.isalt].add(
            -cfg.dsssdt * (state.t[cfg.isalt, -1] - forcing.sss))
        forcing = forcing.replace(stflx=stflx)

    # =====================================================================
    # PREDICTOR STAGE (nrhs = n)  (reference: main.F:385-423)
    # =====================================================================
    eos_n = eos.rho_eos(state.t, zr_n, zw_n, hz_n, grid.rmask, cfg,
                        need_bvf=cfg.lmd_kpp)
    flx_u, flx_v = kinematics.set_huv(state.u, state.v, hz_n, grid)
    flx_u, flx_v = halo(flx_u), halo(flx_v)
    dtau_o = 0.5 * cfg.dt if first_step else 0.6 * cfg.dt  # (omega.F:66-73)
    om = kinematics.omega(flx_u, flx_v, zw_n, hz_n, forcing.swflx, grid,
                          dtau_o, cfg, forcing)
    we, wi = halo(om.we), halo(om.wi)

    if cfg.lmd_kpp:
        vm = _vmix_update(state, state.u, state.v, state.t, eos_n.bvf,
                          zr_n, zw_n, hz_n, forcing, grid, cfg, first_step,
                          halo=halo)
        akv, akt, hbls, hbbl = vm.akv, vm.akt, vm.hbls, vm.hbbl
        akv, akt = halo(akv), halo(akt)
        # (reference: lmd_kpp.F exchanges hbls/hbbl after smoothing)
        hbls, hbbl = halo(hbls), halo(hbbl)

    ru_p, rv_p = prsgrd_mod.prsgrd(eos_n.rho, eos_n.rho1, eos_n.qp1,
                                   zr_n, zw_n, hz_n, grid, cfg,
                                   ptide=forcing.ptide)

    # ---- pre_step3d: LF-AM3 predictor to n+1/2 (pre_step3d4S.F:124-545)
    if first_step:
        dtau = 0.5 * cfg.dt
        cf_stp, cf_bak = 1.0, 0.0
    else:
        dtau = cfg.dt * (1.0 - AM3_CRV)
        cf_stp, cf_bak = 0.5 + AM3_CRV, 0.5 - AM3_CRV

    flx_div = 0.5 * dtau * pmn[None] * (
        shift(flx_u, 0, 1) - flx_u + shift(flx_v, 1, 0) - flx_v
        + (we[1:] + wi[1:]) - (we[:-1] + wi[:-1]))
    hz_bak = hz_n + flx_div
    hz_fwd = hz_n - flx_div

    # tracers → n+1/2 (constancy-preserving pseudo-compressible step),
    # batched over the tracer axis (nt, nz, jy, ix): one set of stencil
    # ops + one vmapped implicit solve regardless of nt (the reference
    # loops per tracer, step3d_t_ISO.F itrc loop; here XLA sees a flat
    # batched program so compile time is independent of nt)
    use_pallas = _use_pallas_tracer(cfg, state, halo)
    if use_pallas:
        # fused flux+divergence+spline+implicit kernel: each nt-sized
        # field crosses HBM once (ops/pallas_tracer.py)
        from roms_tpu.ops import pallas_tracer
        t_half = pallas_tracer.tracer_stage(
            state.t, state.t_prev, flx_u, flx_v, hz_n, flx_div, we, wi,
            akt, pmn, grid.rmask, grid.umask, grid.vmask, cfg,
            cfg.ts_pred_scheme, dtau, cf_stp, cf_bak, False, "pred",
            own=(grid.own_w, grid.own_e, grid.own_s, grid.own_n))
    else:
        fx, fe = adv.horiz_tracer_flux(state.t, flx_u, flx_v, grid,
                                       cfg, cfg.ts_pred_scheme)
        if cfg.river_source:
            fx, fe = rivers_mod.tracer_flux_fix_all(fx, fe, hz_n, zw_n,
                                                    forcing, grid)
        t_rhs = (hz_bak * (cf_stp * state.t + cf_bak * state.t_prev)
                 - dtau * _tracer_divergence(fx, fe, pmn))
        fc = jax.vmap(adv.vert_tracer_flux_spline, in_axes=(0, None, None))(
            state.t, hz_n, we)
        t_rhs = t_rhs - dtau * pmn[None] * (fc[:, 1:] - fc[:, :-1])
        t_half = vmix.tracer_implicit_all(
            t_rhs, hz_fwd, vmix.gather_akt(akt, cfg), wi, pmn, dtau,
            grid.rmask, cfg, apply_mask=False)

    # momentum predictor
    ru, rv = _uv_rhs(state.u, state.v, flx_u, flx_v, hz_n, we, grid, cfg,
                     cfg.uv_pred_scheme)
    ru = ru_p + ru
    rv = rv_p + rv
    rd = vmix.bottom_drag(state.u, state.v, hz_n, cfg)

    dc0_u = dtau * 0.25 * (grid.pm + shift(grid.pm, 0, -1)) * (
        grid.pn + shift(grid.pn, 0, -1))
    dc0_v = dtau * 0.25 * (grid.pm + shift(grid.pm, -1, 0)) * (
        grid.pn + shift(grid.pn, -1, 0))
    hzbak_u = 0.5 * (hz_bak + shift(hz_bak, 0, -1))
    hzbak_v = 0.5 * (hz_bak + shift(hz_bak, -1, 0))
    rhs_u = hzbak_u * (cf_stp * state.u + cf_bak * state.u_prev) + dc0_u[None] * ru
    rhs_v = hzbak_v * (cf_stp * state.v + cf_bak * state.v_prev) + dc0_v[None] * rv
    u_half = _mom_implicit(
        halo, rhs_u, 0.5 * (hz_fwd + shift(hz_fwd, 0, -1)),
        0.5 * (akv + shift(akv, 0, -1)),
        0.5 * (wi + shift(wi, 0, -1)), dc0_u, dtau, forcing.sustr, cfg,
        bottom_drag_coeff=0.5 * (rd + shift(rd, 0, -1)))
    v_half = _mom_implicit(
        halo, rhs_v, 0.5 * (hz_fwd + shift(hz_fwd, -1, 0)),
        0.5 * (akv + shift(akv, -1, 0)),
        0.5 * (wi + shift(wi, -1, 0)), dc0_v, dtau, forcing.svstr, cfg,
        bottom_drag_coeff=0.5 * (rd + shift(rd, -1, 0)))

    # river velocity overwrite + physical BCs + tracer ghost refresh
    # (reference: pre_step3d4S.F:493-550)
    if cfg.river_source:
        u_half, v_half = rivers_mod.overwrite_uv(u_half, v_half, forcing,
                                                 zw_n, grid)
    u_half = bc.u3dbc(u_half, state.u, state.u, state.v, grid, cfg,
                      forcing.bry, pred_stage=True)
    v_half = bc.v3dbc(v_half, state.v, state.u, state.v, grid, cfg,
                      forcing.bry, pred_stage=True)
    t_half = bc.t3dbc(t_half, state.t, state.u, state.v, grid, cfg,
                      forcing.bry, pred_stage=True)
    t_half = halo(t_half)

    # ---- set_HUV1: remove barotropic mismatch, fluxes at n+1/2
    # (reference: set_depth.F:252-422; exchanges at :414-419)
    h1 = kinematics.set_huv1(u_half, v_half, hz_n,
                             state.du_avg1, state.dv_avg1,
                             state.du_avg2, state.dv_avg2,
                             state.du_avg_bak, state.dv_avg_bak,
                             grid, cfg, first_step)
    u_half, v_half = halo(h1.u), halo(h1.v)
    flx_u_h, flx_v_h = halo(h1.flx_u), halo(h1.flx_v)

    # =====================================================================
    # CORRECTOR STAGE (nrhs = n+1/2)  (reference: main.F:425-450)
    # =====================================================================
    om = kinematics.omega(flx_u_h, flx_v_h, zw_n, hz_n, forcing.swflx, grid,
                          cfg.dt, cfg, forcing)
    we, wi = halo(om.we), halo(om.wi)
    eos_h = eos.rho_eos(t_half, zr_n, zw_n, hz_n, grid.rmask, cfg,
                        need_bvf=cfg.lmd_kpp)
    if cfg.lmd_kpp:
        state_h = state.replace(hbls=hbls, hbbl=hbbl)
        vm = _vmix_update(state_h, u_half, v_half, t_half, eos_h.bvf,
                          zr_n, zw_n, hz_n, forcing, grid, cfg, first_step,
                          halo=halo)
        akv, akt, hbls, hbbl, ghat = (vm.akv, vm.akt, vm.hbls, vm.hbbl,
                                      vm.ghat)
        akv, akt = halo(akv), halo(akt)
        hbls, hbbl = halo(hbls), halo(hbbl)

    ru_p, rv_p = prsgrd_mod.prsgrd(eos_h.rho, eos_h.rho1, eos_h.qp1,
                                   zr_n, zw_n, hz_n, grid, cfg,
                                   ptide=forcing.ptide)

    # ---- step3d_uv1: corrector r.h.s. + implicit vertical solve
    # (reference: step3d_uv1.F:123-297, IMPLICIT_BOTTOM_DRAG branch)
    if cfg.uv_diagnostics:
        ru, rv, cori_u, cori_v = _uv_rhs(
            u_half, v_half, flx_u_h, flx_v_h, hz_n, we, grid, cfg,
            cfg.uv_corr_scheme, parts=True)
    else:
        ru, rv = _uv_rhs(u_half, v_half, flx_u_h, flx_v_h, hz_n, we, grid,
                         cfg, cfg.uv_corr_scheme)
    ru = ru_p + ru
    rv = rv_p + rv

    hzu_n = hz_u(hz_n)
    hzv_n = hz_v(hz_n)
    dc0_u_c = cfg.dt * 0.25 * (grid.pm + shift(grid.pm, 0, -1)) * (
        grid.pn + shift(grid.pn, 0, -1))
    dc0_v_c = cfg.dt * 0.25 * (grid.pm + shift(grid.pm, -1, 0)) * (
        grid.pn + shift(grid.pn, -1, 0))
    rd_u = 0.5 * (rd + shift(rd, 0, -1))
    rd_v = 0.5 * (rd + shift(rd, -1, 0))
    vel_u = _mom_implicit(
        halo, hzu_n * state.u + dc0_u_c[None] * ru, hzu_n,
        0.5 * (akv + shift(akv, 0, -1)),
        0.5 * (wi + shift(wi, 0, -1)), dc0_u_c, cfg.dt, forcing.sustr, cfg,
        bottom_drag_coeff=rd_u)
    vel_v = _mom_implicit(
        halo, hzv_n * state.v + dc0_v_c[None] * rv, hzv_n,
        0.5 * (akv + shift(akv, -1, 0)),
        0.5 * (wi + shift(wi, -1, 0)), dc0_v_c, cfg.dt, forcing.svstr, cfg,
        bottom_drag_coeff=rd_v)
    hzu_new = vel_u * hzu_n       # Hz-weighted provisional u (u(:,:,:,nnew))
    hzv_new = vel_v * hzv_n
    uv_budget = None
    if cfg.uv_diagnostics:
        # Hz-weighted per-step terms (reference: diagnostics.F Udiag/Vdiag
        # indices :56-63).  vmix is DIRECT from the implicit solve: the
        # solve returns vel from rhs = Hz*u(n) + dc0*ru, so
        # Hz*vel - rhs == the implicit viscosity + implicit-W advection +
        # bottom drag + surface stress contribution.
        uv_budget = {
            "u": {"pgr": dc0_u_c[None] * ru_p,
                  "cori": dc0_u_c[None] * cori_u,
                  "adv": dc0_u_c[None] * (ru - ru_p - cori_u),
                  "vmix": hzu_new - (hzu_n * state.u + dc0_u_c[None] * ru)},
            "v": {"pgr": dc0_v_c[None] * rv_p,
                  "cori": dc0_v_c[None] * cori_v,
                  "adv": dc0_v_c[None] * (rv - rv_p - cori_v),
                  "vmix": hzv_new - (hzv_n * state.v + dc0_v_c[None] * rv)},
        }
    # 3D→2D forcing integrals (reference: step3d_uv1.F:194-205, :269-279)
    rufrc = jnp.sum(ru, axis=0) + grid.dm_u * grid.dn_u * (
        forcing.sustr - rd_u * vel_u[0])
    rvfrc = jnp.sum(rv, axis=0) + grid.dm_v * grid.dn_v * (
        forcing.svstr - rd_v * vel_v[0])

    # ---- visc3d: lateral harmonic viscosity, sponge-enhanced when
    # grid.visc2_* present (reference: src/visc3d_S.F, src/set_nudgcof.F)
    if cfg.uv_vis2 and (cfg.visc2 != 0.0 or grid.visc2_r is not None):
        from roms_tpu.ops.hmix import visc3d
        du_v, dv_v, dru, drv = visc3d(state.u, state.v, hz_n, grid, cfg,
                                      visc2_r=grid.visc2_r,
                                      visc2_p=grid.visc2_p)
        hzu_new = hzu_new + cfg.dt * du_v
        hzv_new = hzv_new + cfg.dt * dv_v
        rufrc = rufrc + dru
        rvfrc = rvfrc + drv
        if uv_budget is not None:
            uv_budget["u"]["hmix"] = cfg.dt * du_v
            uv_budget["v"]["hmix"] = cfg.dt * dv_v
    if uv_budget is not None and "hmix" not in uv_budget["u"]:
        uv_budget["u"]["hmix"] = jnp.zeros_like(hzu_new)
        uv_budget["v"]["hmix"] = jnp.zeros_like(hzv_new)

    # =====================================================================
    # BAROTROPIC SUB-CYCLE  (reference: main.F:456-464, step2d_FB.F)
    # =====================================================================
    fast = barotropic.fast_loop(
        state.zeta, state.ubar, state.vbar, rufrc, rvfrc,
        eos_h.rho_s, eos_h.rho_a, forcing,
        state.du_avg1, state.dv_avg1, state.du_avg2, state.dv_avg2,
        w1, w2, grid, cfg, halo)
    zeta_new = fast["zeta"]

    # new vertical grid from the fast-averaged free surface
    # (reference: step2d_FB.F:563-570 → set_depth_tile)
    zw_new, zr_new, hz_new = vcoord.set_depth(zeta_new, grid.h, grid.hinv,
                                              grid.cs_w, grid.cs_r,
                                              cfg.hc, cfg.nz)
    zw_new = halo(zw_new)
    zr_new = halo(zr_new)
    hz_new = halo(hz_new)

    # =====================================================================
    # step3d_uv2: couple 3D momentum to the barotropic mode
    # (reference: step3d_uv2.F:82-786)
    # =====================================================================
    hzu_nn = hz_u(hz_new)
    hzv_nn = hz_v(hz_new)
    # part (a): first mismatch correction (coupling-only branch,
    # reference: step3d_uv2.F:244-268, :374-398)
    cf0_u = jnp.sum(hzu_nn, axis=0)
    dcol_u = jnp.sum(hzu_new, axis=0)
    u_tmp = hzu_new / hzu_nn
    mis_u = (dcol_u * grid.dn_u - fast["du_avg1"]) / (cf0_u * grid.dn_u)
    u_new = u_tmp - mis_u[None]
    cf0_v = jnp.sum(hzv_nn, axis=0)
    dcol_v = jnp.sum(hzv_new, axis=0)
    v_tmp = hzv_new / hzv_nn
    mis_v = (dcol_v * grid.dm_v - fast["dv_avg1"]) / (cf0_v * grid.dm_v)
    v_new = v_tmp - mis_v[None]
    if cfg.masking:
        u_new = u_new * grid.umask[None]
        v_new = v_new * grid.vmask[None]

    # physical boundary conditions (reference: step3d_uv2.F:471-472)
    u_new = bc.u3dbc(u_new, state.u, u_half, v_half, grid, cfg,
                     forcing.bry, pred_stage=False)
    v_new = bc.v3dbc(v_new, state.v, u_half, v_half, grid, cfg,
                     forcing.bry, pred_stage=False)

    # part (b): recompute vertical integrals, barotropic replacement and
    # the n+1/2 flux correction (reference: step3d_uv2.F:521-621)
    dcu = hzu_nn * grid.dn_u[None]
    dcv = hzv_nn * grid.dm_v[None]
    inv_du = 1.0 / jnp.sum(dcu, axis=0)
    inv_dv = 1.0 / jnp.sum(dcv, axis=0)
    ubar_new = inv_du * fast["du_avg1"]
    vbar_new = inv_dv * fast["dv_avg1"]
    fc_u = inv_du * (jnp.sum(dcu * u_new, axis=0) - fast["du_avg1"])
    fc_v = inv_dv * (jnp.sum(dcv * v_new, axis=0) - fast["dv_avg1"])
    u_new = u_new - fc_u[None]
    v_new = v_new - fc_v[None]
    if cfg.masking:
        u_new = u_new * grid.umask[None]
        v_new = v_new * grid.vmask[None]
    dlt, eps = cfg.coup_delta, cfg.coup_epsil
    cf_u = dlt * flx_u_h + eps * dcu * (state.u + u_new)
    cf_v = dlt * flx_v_h + eps * dcv * (state.v + v_new)
    mis2_u = inv_du * (jnp.sum(cf_u, axis=0) - fast["du_avg2"])
    mis2_v = inv_dv * (jnp.sum(cf_v, axis=0) - fast["dv_avg2"])
    flx_u_c = cf_u - dcu * mis2_u[None]
    flx_v_c = cf_v - dcv * mis2_v[None]

    # river overwrite (reference: step3d_uv2.F:689-717)
    if cfg.river_source:
        u_new, v_new = rivers_mod.overwrite_uv(u_new, v_new, forcing,
                                               zw_new, grid)

    # non-hydrostatic pressure projection on the corrected horizontal
    # velocities (reference: the NHMG coupling of step3d_uv2 when the
    # NHMG cppkey is on; the library ships disabled and so does this
    # flag — roms_tpu/nhmg.py documents the solver and its deviations).
    # DEVIATION (documented, advisor r4): the trial vertical velocity is
    # zero and nh.w is discarded — w here is purely diagnostic (recomputed
    # from continuity by omega/wvlcty), not prognostic as in the reference
    # NHMG, so 'converged == non-divergent' holds for (u,v,nh.w) but NOT
    # for (u,v) together with the model's recomputed w.  The projection
    # therefore acts as a horizontal-divergence damping, valid only in the
    # weakly-non-hydrostatic regime; see roms_tpu/nhmg.py module docstring.
    if cfg.non_hydrostatic:
        from roms_tpu import nhmg
        w0 = jnp.zeros((cfg.nz + 1,) + u_new.shape[1:], u_new.dtype)
        nh = nhmg.nh_solve(u_new, v_new, w0, hz_new, zr_new,
                           grid.pm, grid.pn, grid, cfg)
        u_new, v_new = nh.u, nh.v

    if uv_budget is not None:
        # rate and the 2D/3D coupling + BC correction (reference:
        # diagnostics.F icoup; recorded against the post-coupling state)
        for comp, hz_nn, hz_0, vel0, velf, b in (
                ("u", hzu_nn, hzu_n, state.u, u_new, uv_budget["u"]),
                ("v", hzv_nn, hzv_n, state.v, v_new, uv_budget["v"])):
            rate = hz_nn * velf - hz_0 * vel0
            b["rate"] = rate
            b["coup"] = rate - (b["pgr"] + b["cori"] + b["adv"]
                                + b["hmix"] + b["vmix"])

    u_new, v_new = halo(u_new), halo(v_new)
    flx_u_c, flx_v_c = halo(flx_u_c), halo(flx_v_c)
    ubar_new, vbar_new = halo(ubar_new), halo(vbar_new)

    # =====================================================================
    # TRACER CORRECTOR (reference: main.F:469-473, step3d_t_ISO.F)
    # =====================================================================
    om = kinematics.omega(flx_u_c, flx_v_c, zw_new, hz_new, forcing.swflx,
                          grid, cfg.dt, cfg, forcing)
    we, wi = halo(om.we), halo(om.wi)

    iso = None
    if cfg.adv_isoneutral:
        # slope/coefficient fields of the rotated biharmonic
        # (reference: prsgrd.F:306-336 corrector stage,
        # step3d_uv2.F:571-683 diff3u/diff3v + idRz)
        from roms_tpu.ops import isoneutral
        iso = isoneutral.slope_fields(
            eos_h.rho, eos_h.rho1, eos_h.qp1, zr_new, zw_new, hz_new,
            hbls, hbbl, u_new, v_new, grid, cfg)

    # batched tracer corrector (nt, nz, jy, ix); the reference loops per
    # tracer (step3d_t_ISO.F itrc loop) — here the whole tracer set moves
    # through one batched set of stencil ops + one vmapped implicit solve
    if use_pallas:
        from roms_tpu.ops import pallas_tracer
        t_sec_c = state.t
        if cfg.lmd_kpp:
            # fold the penetrating-solar + nonlocal KPP terms into the
            # base content: t_base = hz_n*t_sec_c == hz_n*t + dt*d(gw)/dk
            # (additive terms commute; reference: step3d_t_ISO.F:961-1005)
            nzz = cfg.nz
            gw = jnp.zeros_like(wi)
            gsrc = forcing.srflx[None] * state.swrf[1:nzz]
            if ghat is not None:
                gsrc = gsrc - ghat[1:nzz] * (forcing.stflx[cfg.itemp]
                                             - forcing.srflx)[None]
            gw = gw.at[1:nzz].set(gsrc)
            t_sec_c = t_sec_c.at[cfg.itemp].add(
                cfg.dt * (gw[1:] - gw[:-1]) / hz_n)
            if cfg.salinity and ghat is not None:
                gws = jnp.zeros_like(wi)
                gws = gws.at[1:nzz].set(-ghat[1:nzz]
                                        * forcing.stflx[cfg.isalt][None])
                t_sec_c = t_sec_c.at[cfg.isalt].add(
                    cfg.dt * (gws[1:] - gws[:-1]) / hz_n)
        mix = None
        if cfg.ts_dif2 and (cfg.tnu2 != 0.0 or grid.diff2 is not None):
            # fold t3dmix into the corrector kernel (its fluxes read only
            # t_half, which is already the stage's stencil window)
            diff2 = grid.diff2
            if diff2 is None:
                diff2 = jnp.full((cfg.nt,) + grid.h.shape, cfg.tnu2,
                                 t_half.dtype)
            mix = {"diff2": diff2, "pmon_u": grid.pmon_u,
                   "pnom_v": grid.pnom_v}
        t_new = pallas_tracer.tracer_stage(
            t_half, t_sec_c, flx_u_c, flx_v_c, hz_n, hz_new, we, wi,
            akt, pmn, grid.rmask, grid.umask, grid.vmask, cfg,
            cfg.ts_corr_scheme, cfg.dt, 0.0, 1.0, True, "corr",
            stflx=forcing.stflx, mix=mix,
            own=(grid.own_w, grid.own_e, grid.own_s, grid.own_n))
        return _finish_tracers(state, forcing, grid, cfg, halo,
                               t_new, t_half, u_half, v_half,
                               zeta_new, ubar_new, vbar_new,
                               u_new, v_new, flx_u_c, flx_v_c, we, wi,
                               hz_new, zr_new, zw_new, hz_n,
                               akv, akt, hbls, hbbl, fast,
                               upscale=None, t_budget=None,
                               uv_budget=uv_budget,
                               t3dmix_done=mix is not None)
    fx, fe = adv.horiz_tracer_flux(t_half, flx_u_c, flx_v_c, grid,
                                   cfg, cfg.ts_corr_scheme)
    if cfg.river_source:
        fx, fe = rivers_mod.tracer_flux_fix_all(fx, fe, hz_new, zw_new,
                                                forcing, grid)
    upscale = None
    if cfg.upscale_output:
        # outward advective flux at open-boundary faces, captured at the
        # FULL local edge length (halo rows included — the writer trims;
        # under the mesh only edge-owning blocks hold real values and
        # dist._assemble_locals reduces them to a replicated global strip)
        # (reference: upscale_output.F:232-313 calc_forcing_rates)
        upscale = {}
        if cfg.obc_west:
            upscale["west"] = -fx[:, :, :, 2]
        if cfg.obc_east:
            upscale["east"] = fx[:, :, :, -2 - cfg.pad_e]
        if cfg.obc_south:
            upscale["south"] = -fe[:, :, 2, :]
        if cfg.obc_north:
            upscale["north"] = fe[:, :, -2 - cfg.pad_n, :]
    t_base = hz_n * state.t
    term_hadv = -cfg.dt * _tracer_divergence(fx, fe, pmn)
    fc = jax.vmap(adv.vert_tracer_flux_spline, in_axes=(0, None, None))(
        t_half, hz_new, we)
    term_vadv = -cfg.dt * pmn[None] * (fc[:, 1:] - fc[:, :-1])
    t_rhs = t_base + term_hadv + term_vadv
    if cfg.pipe_source:
        # pipe tracer load (reference: step3d_t_ISO.F:927-934)
        src3d = kinematics.pipe_profile_3d(forcing, cfg.nz)
        npip = forcing.pipe_trc.shape[0]
        trc_p = jnp.moveaxis(
            forcing.pipe_trc[jnp.clip(forcing.pipe_idx, 0, npip - 1)],
            -1, 0)                       # (nt, jy, ix)
        t_rhs = t_rhs + cfg.dt * pmn[None] * src3d[None] * trc_p[:, None]
    if forcing.cdr is not None:
        # mCDR release injection (reference: step3d_t_ISO.F:859-902)
        from roms_tpu.cdr import apply_cdr_all
        t_rhs = apply_cdr_all(t_rhs, forcing.cdr, pmn, cfg.dt,
                              j0=grid.j0, i0=grid.i0)
    # surface forcing flux (reference: step3d_t_ISO.F:956-959)
    t_rhs = t_rhs.at[:, -1].add(cfg.dt * forcing.stflx)
    if cfg.lmd_kpp:
        # penetrating solar + nonlocal KPP transport for T (and ghat for S)
        # (reference: step3d_t_ISO.F:961-1005)
        nzz = cfg.nz
        gw = jnp.zeros_like(wi)
        gsrc = forcing.srflx[None] * state.swrf[1:nzz]
        if ghat is not None:
            gsrc = gsrc - ghat[1:nzz] * (forcing.stflx[cfg.itemp]
                                         - forcing.srflx)[None]
        gw = gw.at[1:nzz].set(gsrc)
        t_rhs = t_rhs.at[cfg.itemp].add(cfg.dt * (gw[1:] - gw[:-1]))
        if cfg.salinity and ghat is not None:
            gws = jnp.zeros_like(wi)
            gws = gws.at[1:nzz].set(-ghat[1:nzz]
                                    * forcing.stflx[cfg.isalt][None])
            t_rhs = t_rhs.at[cfg.isalt].add(cfg.dt * (gws[1:] - gws[:-1]))
    akt_b = vmix.gather_akt(akt, cfg)
    if iso is not None:
        # rotated biharmonic increment + STABILIZE diffusivity
        # (reference: step3d_t_ISO.F:255-825, implicit part :1050-1064);
        # Akz depends only on the slope fields, so it is tracer-independent
        incr, akz = jax.vmap(
            lambda tk: isoneutral.isoneutral_increment(
                tk, iso, hz_new, zr_new, grid, cfg, halo),
            out_axes=(0, None))(state.t)
        t_rhs = t_rhs + incr
        if akz is not None:
            akt_b = akt_b.at[:, 1:cfg.nz].add(akz)
    t_new = vmix.tracer_implicit_all(
        t_rhs, hz_new, akt_b, wi, pmn, cfg.dt, grid.rmask, cfg,
        apply_mask=True)
    t_budget = None
    if cfg.tracer_diagnostics:
        # term-by-term budget (reference: src/diagnostics.F
        # TXadv/TVadv/TForc explicit).  vmix = hz*t_new - t_rhs is the
        # implicit solve's contribution recorded DIRECTLY at the solve
        # (t_rhs is the pre-implicit content) — verified against an
        # independent flux reconstruction in tests/test_budget.py.
        term_forc = t_rhs - t_base - term_hadv - term_vadv
        rate = hz_new * t_new - t_base
        t_budget = {"hadv": term_hadv, "vadv": term_vadv,
                    "forc": term_forc,
                    "vmix": hz_new * t_new - t_rhs,
                    "rate": rate}

    return _finish_tracers(state, forcing, grid, cfg, halo,
                           t_new, t_half, u_half, v_half,
                           zeta_new, ubar_new, vbar_new,
                           u_new, v_new, flx_u_c, flx_v_c, we, wi,
                           hz_new, zr_new, zw_new, hz_n,
                           akv, akt, hbls, hbbl, fast,
                           upscale=upscale, t_budget=t_budget,
                           uv_budget=uv_budget)


def _finish_tracers(state, forcing, grid, cfg, halo, t_new, t_half,
                    u_half, v_half, zeta_new, ubar_new, vbar_new,
                    u_new, v_new, flx_u_c, flx_v_c, we, wi,
                    hz_new, zr_new, zw_new, hz_n,
                    akv, akt, hbls, hbbl, fast, upscale, t_budget,
                    uv_budget, t3dmix_done=False):
    """Post-corrector tail shared by the jnp and Pallas tracer paths:
    t3dmix → tracer BCs → BGC column physics → halo refresh → final EOS →
    state assembly (reference: main.F:469-490 tail).

    t3dmix_done: the Pallas corrector already added the lateral-diffusion
    tendency in-kernel (pallas_tracer.tracer_stage mix=...)."""
    from roms_tpu.ops import bc, eos

    # t3dmix lateral diffusion (reference: src/t3dmix_S.F, TS_DIF2)
    if (not t3dmix_done and cfg.ts_dif2
            and (cfg.tnu2 != 0.0 or grid.diff2 is not None)):
        from roms_tpu.ops.hmix import t3dmix
        t_new = t3dmix(t_new, t_half, hz_new, grid, cfg, diff2=grid.diff2)

    t_new = bc.t3dbc(t_new, state.t, u_half, v_half, grid, cfg,
                     forcing.bry, pred_stage=False)

    # ---- biogeochemistry column physics, applied to the updated tracers
    # after BCs and before the halo refresh, exactly where the reference
    # calls MARBL/BEC (reference: step3d_t_ISO.F:1158-1175)
    if cfg.bgc_model != "none" and cfg.n_bgc > 0:
        from roms_tpu.bgc.api import BGCContext, get_model
        model = get_model(cfg.bgc_model)
        i0 = cfg.nt - cfg.n_bgc
        ctx = BGCContext(
            temp=t_new[cfg.itemp],
            salt=t_new[cfg.isalt] if cfg.salinity else None,
            z_r=zr_new, z_w=zw_new, hz=hz_new, srflx=forcing.srflx,
            swr_frac=state.swrf, rmask=grid.rmask, dt=cfg.dt,
            time=state.time)
        # atmospheric BGC forcing fields (dust/iron/pco2/...) ride on the
        # Forcing pytree (reference: bgc_forces.F via set_forces); the
        # gas-exchange wind speed is the bulk wspd when the case carries
        # one, else inverted from the kinematic stress exactly like the
        # reference (bec2_driver.F:186-192 BULK_FRC branch vs WS())
        bgc_forc = dict(forcing.bgc) if forcing.bgc else {}
        if "wspd" not in bgc_forc:
            from roms_tpu.bgc.bec import wind_speed_from_stress
            sustr_r = 0.5 * (forcing.sustr + shift(forcing.sustr, 0, 1))
            svstr_r = 0.5 * (forcing.svstr + shift(forcing.svstr, 1, 0))
            bgc_forc["wspd"] = wind_speed_from_stress(
                sustr_r, svstr_r, cfg.rho0)
        dtr, _ = model.interior_tendency(t_new[i0:], ctx, None, bgc_forc)
        sfl = model.surface_flux(t_new[i0:], ctx, bgc_forc)
        t_bgc = t_new[i0:] + cfg.dt * dtr
        t_bgc = t_bgc.at[:, -1].add(cfg.dt * sfl / hz_new[-1])
        if cfg.masking:
            t_bgc = t_bgc * grid.rmask[None, None]
        t_new = t_new.at[i0:].set(t_bgc)

    t_new = halo(t_new)  # (reference: step3d_t_ISO.F:1167-1177)

    # final density for diagnostics/output (reference: main.F:479)
    eos_new = eos.rho_eos(t_new, zr_new, zw_new, hz_new, grid.rmask, cfg)

    return state.replace(
        upscale=upscale, t_budget=t_budget, uv_budget=uv_budget,
        zeta=zeta_new, ubar=ubar_new, vbar=vbar_new,
        u=u_new, v=v_new, u_prev=state.u, v_prev=state.v,
        t=t_new, t_prev=state.t,
        z_w=zw_new, z_r=zr_new, hz=hz_new,
        du_avg1=fast["du_avg1"], dv_avg1=fast["dv_avg1"],
        du_avg2=fast["du_avg2"], dv_avg2=fast["dv_avg2"],
        du_avg_bak=fast["du_avg_bak"], dv_avg_bak=fast["dv_avg_bak"],
        flx_u=flx_u_c, flx_v=flx_v_c, we=we, wi=wi, rho=eos_new.rho,
        akv=akv, akt=akt, hbls=hbls, hbbl=hbbl,
        iic=state.iic + 1, time=state.time + cfg.dt)


@partial(jax.jit, static_argnames=("cfg", "first_step"))
def step(state: OceanState, forcing: Forcing, grid: Grid, w1, w2,
         cfg: ModelConfig, first_step: bool) -> OceanState:
    """Single-block step (periodic / physical-boundary halo wrap)."""
    return step_impl(state, forcing, grid, w1, w2, cfg, first_step,
                     make_halo_fill(cfg))
