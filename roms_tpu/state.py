"""Model state as an explicit immutable pytree.

Replaces the reference's global module arrays (reference: src/ocean_vars.F,
src/tracers.F, src/coupling.F) with a functional state threaded through the
time step.  Time levels are explicit named fields instead of rotating
indices:

  reference                         here
  ------------------------------    ------------------------------------
  zeta(:,:,knew) after fast avg     zeta      (time n, = Zt_avg1 copy)
  ubar/vbar(:,:,knew) after uv2     ubar,vbar (DU_avg1/D based)
  u(:,:,:,nstp)                     u, v      (time n, m/s)
  u(:,:,:,3-nstp) entering step     u_prev    (time n-1, m/s)
  t(:,:,:,nstp,:)                   t         (nt, nz, ..) at n
  t(:,:,:,3-nstp,:) entering step   t_prev    (n-1)
  DU_avg1/2, DU_avg_bak             du_avg1, du_avg2, du_avg_bak
  z_w, z_r, Hz                      z_w, z_r, hz (updated end of fast loop)
  FlxU,FlxV / We,Wi / rho           flx_u.. (post-corrector, for diag)

All horizontal fields padded with halo ghosts; 3D fields are (nz, jy, ix),
w-type fields (nz+1, jy, ix), tracers (nt, nz, jy, ix).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from roms_tpu.config import ModelConfig


from typing import Optional


@struct.dataclass
class BoundaryData:
    """Externally specified open-boundary data, one slice per open edge,
    already time-interpolated to the current step (reference: src/boundary.F
    zeta/ubar/vbar/u/v/t_{west,east,south,north} arrays filled by
    set_bry_all).

    West/east arrays run along the padded eta axis (jy,); south/north along
    the padded xi axis (ix,).  3D fields are (nz, edge); tracers are
    (nt, nz, edge).  All fields optional — None means that edge has no data
    (pure radiation / gradient boundary).
    """
    zeta_west: Optional[jax.Array] = None
    zeta_east: Optional[jax.Array] = None
    zeta_south: Optional[jax.Array] = None
    zeta_north: Optional[jax.Array] = None
    ubar_west: Optional[jax.Array] = None
    ubar_east: Optional[jax.Array] = None
    ubar_south: Optional[jax.Array] = None
    ubar_north: Optional[jax.Array] = None
    vbar_west: Optional[jax.Array] = None
    vbar_east: Optional[jax.Array] = None
    vbar_south: Optional[jax.Array] = None
    vbar_north: Optional[jax.Array] = None
    u_west: Optional[jax.Array] = None
    u_east: Optional[jax.Array] = None
    u_south: Optional[jax.Array] = None
    u_north: Optional[jax.Array] = None
    v_west: Optional[jax.Array] = None
    v_east: Optional[jax.Array] = None
    v_south: Optional[jax.Array] = None
    v_north: Optional[jax.Array] = None
    t_west: Optional[jax.Array] = None
    t_east: Optional[jax.Array] = None
    t_south: Optional[jax.Array] = None
    t_north: Optional[jax.Array] = None
    # per-point Orlanski binding-velocity overrides along each edge
    # (reference: sponge_tune.F ub_west/... arrays tuned by
    # adjust_orlanski; scalar cfg.ubind applies when None)
    ub_west: Optional[jax.Array] = None
    ub_east: Optional[jax.Array] = None
    ub_south: Optional[jax.Array] = None
    ub_north: Optional[jax.Array] = None


def zero_boundary(cfg: ModelConfig, dtype=jnp.float64) -> BoundaryData:
    """Zero-valued boundary data on every open edge of `cfg`."""
    h = cfg.halo
    jy, ix = cfg.ny + 2 * h, cfg.nx + 2 * h
    kw = {}
    for edge, n in (("west", jy), ("east", jy), ("south", ix), ("north", ix)):
        if not getattr(cfg, f"obc_{edge}"):
            continue
        kw[f"zeta_{edge}"] = jnp.zeros((n,), dtype)
        kw[f"ubar_{edge}"] = jnp.zeros((n,), dtype)
        kw[f"vbar_{edge}"] = jnp.zeros((n,), dtype)
        kw[f"u_{edge}"] = jnp.zeros((cfg.nz, n), dtype)
        kw[f"v_{edge}"] = jnp.zeros((cfg.nz, n), dtype)
        kw[f"t_{edge}"] = jnp.zeros((cfg.nt, cfg.nz, n), dtype)
    return BoundaryData(**kw)


@struct.dataclass
class Forcing:
    """Surface forcing fields (reference: src/surf_flux.F) plus point
    sources (reference: src/river_frc.F, src/pipe_frc.F)."""
    sustr: jax.Array   # kinematic wind stress at u [m^2/s^2]
    svstr: jax.Array
    stflx: jax.Array   # (nt, jy, ix) surface tracer fluxes
    srflx: jax.Array   # shortwave radiation [degC m/s]
    swflx: jax.Array   # freshwater (P-E) volume flux [m/s]
    # surface restoring data (reference: src/surf_flux.F:118-163
    # QCORRECTION / SFLX_CORR): SST/SSS fields the surface tracer fluxes
    # relax toward with piston velocities cfg.dsstdt / cfg.dsssdt
    sst: Optional[jax.Array] = None
    sss: Optional[jax.Array] = None
    # rivers: face fluxes encode river id and fraction as
    # +-frac/faces + 10*id (reference: river_frc.F:240-280)
    riv_uflx: Optional[jax.Array] = None
    riv_vflx: Optional[jax.Array] = None
    riv_vol: Optional[jax.Array] = None   # (nriv+1,) volume flux [m^3/s]
    riv_trc: Optional[jax.Array] = None   # (nriv+1, nt) tracer conc.
    # pipes: submerged point sources with a vertical dispersion profile
    # (reference: src/pipe_frc.F)
    pipe_flx: Optional[jax.Array] = None  # (jy, ix) volume flux [m^3/s]
    pipe_idx: Optional[jax.Array] = None  # (jy, ix) int32 pipe id (0 = none)
    pipe_prf: Optional[jax.Array] = None  # (npip+1, nz) profile, sums to 1
    pipe_trc: Optional[jax.Array] = None  # (npip+1, nt) tracer conc.
    # open-boundary data (reference: src/boundary.F via set_bry_all)
    bry: Optional[BoundaryData] = None
    # surface tidal potential [m] (reference: src/tides.F ptide,
    # applied at src/prsgrd.F:210)
    ptide: Optional[jax.Array] = None
    # mCDR release forcing (reference: src/cdr_frc.F); CdrForcing pytree
    cdr: Optional["object"] = None
    # BGC atmospheric forcing fields (reference: src/bgc_forces.F via
    # bgc.opt: dust/iron/pco2_air[...]): dict name -> (jy, ix) array
    bgc: Optional[dict] = None


@struct.dataclass
class OceanState:
    zeta: jax.Array
    ubar: jax.Array
    vbar: jax.Array
    u: jax.Array
    v: jax.Array
    u_prev: jax.Array
    v_prev: jax.Array
    t: jax.Array
    t_prev: jax.Array
    # vertical grid (moves with zeta)
    z_w: jax.Array
    z_r: jax.Array
    hz: jax.Array
    # fast-averaged barotropic fluxes and their history
    du_avg1: jax.Array
    dv_avg1: jax.Array
    du_avg2: jax.Array
    dv_avg2: jax.Array
    du_avg_bak: jax.Array
    dv_avg_bak: jax.Array
    # post-corrector diagnostics fields (time n+1/2 fluxes, n+1 density)
    flx_u: jax.Array
    flx_v: jax.Array
    we: jax.Array
    wi: jax.Array
    rho: jax.Array
    # vertical mixing coefficients (reference: src/mixing.F)
    akv: jax.Array     # (nz+1, jy, ix)
    akt: jax.Array     # (n_akt, nz+1, jy, ix)
    # KPP boundary layer state (reference: src/mixing.F hbls/hbbl,
    # src/lmd_swr_frac.F swr_frac computed once at init)
    hbls: jax.Array
    hbbl: jax.Array
    swrf: jax.Array    # (nz+1, jy, ix)
    # clock
    iic: jax.Array     # int32 step counter
    time: jax.Array    # model time [s]
    # outward advective tracer fluxes at open-boundary faces, captured
    # from the tracer corrector when cfg.upscale_output
    # (reference: src/upscale_output.F calc_forcing_rates); dict
    # edge -> (nt, nz, edge_len) or None
    upscale: Optional[dict] = None
    # term-by-term tracer budget of the last step when
    # cfg.tracer_diagnostics (reference: src/diagnostics.F): dict with
    # keys hadv/vadv/forc/vmix/rate, each (nt, nz, jy, ix), Hz-weighted
    # tendencies [C*m/step]; vmix = hz_new*t_new - t_rhs is the
    # implicit-solve contribution recorded directly at the solve
    # (verified against an independent flux reconstruction in
    # tests/test_budget.py)
    t_budget: Optional[dict] = None
    # term-by-term momentum budgets when cfg.uv_diagnostics
    # (reference: src/diagnostics.F Udiag/Vdiag, term indices
    # diagnostics.F:56-63): dict u/v -> dict with keys
    # pgr/cori/adv/hmix/vmix/coup/rate, each (nz, jy, ix) Hz-weighted
    # tendencies [m^2/step]; adv combines the advective and
    # UP3-dissipation parts (iadv+idiss), vmix is recorded directly from
    # the implicit solve (viscosity + implicit W advection + bottom drag
    # + surface stress), coup is the 2D/3D coupling + BC correction
    uv_budget: Optional[dict] = None


def zeros_state(cfg: ModelConfig, dtype=jnp.float64) -> OceanState:
    h = cfg.halo
    jy, ix = cfg.ny + 2 * h, cfg.nx + 2 * h
    z2 = lambda: jnp.zeros((jy, ix), dtype)
    z3 = lambda: jnp.zeros((cfg.nz, jy, ix), dtype)
    zw = lambda: jnp.zeros((cfg.nz + 1, jy, ix), dtype)
    zt = lambda: jnp.zeros((cfg.nt, cfg.nz, jy, ix), dtype)
    return OceanState(
        zeta=z2(), ubar=z2(), vbar=z2(),
        u=z3(), v=z3(), u_prev=z3(), v_prev=z3(),
        t=zt(), t_prev=zt(),
        z_w=zw(), z_r=z3(), hz=z3(),
        du_avg1=z2(), dv_avg1=z2(), du_avg2=z2(), dv_avg2=z2(),
        du_avg_bak=z2(), dv_avg_bak=z2(),
        flx_u=z3(), flx_v=z3(), we=zw(), wi=zw(), rho=z3(),
        akv=zw(),
        akt=jnp.zeros((cfg.i_t_and_s, cfg.nz + 1, jy, ix), dtype),
        hbls=z2(), hbbl=z2(), swrf=zw(),
        iic=jnp.zeros((), jnp.int32), time=jnp.zeros((), dtype),
    )


def zero_forcing(cfg: ModelConfig, dtype=jnp.float64) -> Forcing:
    h = cfg.halo
    jy, ix = cfg.ny + 2 * h, cfg.nx + 2 * h
    z2 = lambda: jnp.zeros((jy, ix), dtype)
    return Forcing(sustr=z2(), svstr=z2(),
                   stflx=jnp.zeros((cfg.nt, jy, ix), dtype),
                   srflx=z2(), swflx=z2())
