"""Slow/fast pressure-flux decomposition for nesting + sponge tuning
(reference: src/calc_pflx_mod.F:14-20, calc_pressure_flux :81-171).

The baroclinic wave energy flux u'p' is computed from the FAST (high
-frequency) parts of the hydrostatic pressure and the baroclinic
velocity, where "slow" is an exponential moving average with rate
alpha = dt/timescale (reference: calc_pflx_mod.F:49-50) — the flux a
nested child radiates, compared by sponge_tune against the flux the
parent supplies.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from roms_tpu.config import ModelConfig
from roms_tpu.parallel.halo import shift


@struct.dataclass
class PflxState:
    p_slow: jax.Array   # (nz, jy, ix) filtered hydrostatic pressure
    u_slow: jax.Array   # (nz, jy, ix) filtered baroclinic u
    v_slow: jax.Array


def init_pflx(cfg: ModelConfig, dtype=jnp.float64) -> PflxState:
    h = cfg.halo
    z3 = jnp.zeros((cfg.nz, cfg.ny + 2 * h, cfg.nx + 2 * h), dtype)
    return PflxState(p_slow=z3, u_slow=z3, v_slow=z3)


def hydrostatic_pressure(zeta, rho, hz, cfg: ModelConfig):
    """Kinematic hydrostatic pressure p/rho0 at rho points [m^2/s^2]:
    g*zeta + (g/rho0) * integral of the density anomaly from the surface
    down to the cell center (reference: the P array prsgrd.F builds for
    its Jacobian and hands to calc_pressure_flux)."""
    g = cfg.g
    w = rho * hz
    above = jnp.flip(jnp.cumsum(jnp.flip(w, 0), axis=0), 0) - 0.5 * w
    return g * zeta[None] + (g / cfg.rho0) * above


def calc_pflx(pf: PflxState, state, grid, cfg: ModelConfig,
              timescale: float):
    """One filter update; returns (new PflxState, up, vp) where up/vp are
    the column-integrated fast pressure fluxes u'p' at u/v points
    [m^3/s^3] (reference: calc_pflx_mod.F:136-168)."""
    alpha = cfg.dt / timescale
    beta = 1.0 - alpha

    p = hydrostatic_pressure(state.zeta, state.rho, state.hz, cfg)
    p_slow = beta * pf.p_slow + alpha * p
    p_fast = p - p_slow

    # barotropic velocities from the column-summed fluxes
    # (reference: :110-132)
    uflx = jnp.sum(state.flx_u, axis=0)
    vflx = jnp.sum(state.flx_v, axis=0)
    zcol = state.z_w[-1] - state.z_w[0]
    ub = uflx * (grid.pn + shift(grid.pn, 0, -1)) / (zcol
                                                     + shift(zcol, 0, -1))
    vb = vflx * (grid.pm + shift(grid.pm, -1, 0)) / (zcol
                                                     + shift(zcol, -1, 0))

    du = state.u - ub[None]
    dv = state.v - vb[None]
    u_slow = beta * pf.u_slow + alpha * du
    v_slow = beta * pf.v_slow + alpha * dv
    u_fast = du - u_slow
    v_fast = dv - v_slow

    hz = state.hz
    up = jnp.sum(u_fast * 0.25 * (p_fast + shift(p_fast, 0, -1))
                 * (hz + shift(hz, 0, -1)), axis=0)
    vp = jnp.sum(v_fast * 0.25 * (p_fast + shift(p_fast, -1, 0))
                 * (hz + shift(hz, -1, 0)), axis=0)
    return (PflxState(p_slow=p_slow, u_slow=u_slow, v_slow=v_slow),
            up, vp)
