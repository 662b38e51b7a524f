"""Reduced NPZD ecosystem: the built-in BGC engine exercising the coupling
surface (the structural stand-in for the reference's BEC2 built-in
ecosystem, reference: src/bec2_driver.F ecosys_bec2_tile — light- and
nutrient-limited growth, grazing, mortality, remineralization, sinking
detritus — at 4 tracers instead of 26).

Tracers: NO3 (mmol N/m3), PHYT, ZOO, DET.  All source/sink terms are local
except detritus sinking (an upwind column flux).  Everything is a pure
full-field function; XLA fuses it into the tracer corrector.
"""

from __future__ import annotations

import jax.numpy as jnp

from roms_tpu.bgc.api import BGCContext, BGCModel, register

# parameters (typical NPZD ranges; structure follows Fasham/Franks lineage
# used by the reference's simpler BGC configs)
VMAX = 1.0 / 86400.0      # max phyto growth [1/s]
K_NO3 = 0.5               # nutrient half-saturation [mmol/m3]
ALPHA_LIGHT = 0.025       # initial slope of P-I curve [(W/m2)^-1 day^-1]-ish
PAR_FRAC = 0.43           # photosynthetically available fraction
RHO0_CP = 1000.0 * 3985.0  # converts kinematic heat flux back to W/m2
GMAX = 0.6 / 86400.0      # max grazing [1/s]
K_P = 1.0                 # grazing half-saturation
BETA_Z = 0.75             # assimilation efficiency
M_P = 0.05 / 86400.0      # phyto mortality [1/s]
M_Z = 0.1 / 86400.0       # zoo quadratic mortality [1/(mmol/m3 s)]
REMIN = 0.1 / 86400.0     # detritus remineralization [1/s]
W_DET = 5.0 / 86400.0     # detritus sinking speed [m/s]
EPS = 1e-12


def _light(ctx: BGCContext):
    """PAR at rho levels from the penetrative solar profile [W/m2]
    (reference analog: bec2 uses swr_frac from lmd_swr_frac)."""
    sw_wm2 = ctx.srflx[None] * RHO0_CP  # back to W/m2 at surface
    frac_r = 0.5 * (ctx.swr_frac[1:] + ctx.swr_frac[:-1])
    return PAR_FRAC * jnp.maximum(sw_wm2, 0.0) * frac_r


def interior_tendency(trc, ctx: BGCContext, saved, forc=None):
    no3, phy, zoo, det = trc[0], trc[1], trc[2], trc[3]
    no3 = jnp.maximum(no3, 0.0)
    phy = jnp.maximum(phy, 0.0)
    zoo = jnp.maximum(zoo, 0.0)
    det = jnp.maximum(det, 0.0)

    par = _light(ctx)
    # light limitation (tanh P-I curve) x nutrient limitation
    lim_i = jnp.tanh(ALPHA_LIGHT * par)
    lim_n = no3 / (K_NO3 + no3)
    growth = VMAX * lim_i * lim_n * phy
    graze = GMAX * phy * phy / (K_P * K_P + phy * phy) * zoo
    mort_p = M_P * phy
    mort_z = M_Z * zoo * zoo
    remin = REMIN * det

    d_no3 = -growth + remin
    d_phy = growth - graze - mort_p
    d_zoo = BETA_Z * graze - mort_z
    d_det = (1.0 - BETA_Z) * graze + mort_p + mort_z - remin

    # detritus sinking: upwind (downward) flux divergence over the column;
    # no flux through surface, material reaching the bottom stays in the
    # bottom cell (conservative)
    flux = W_DET * det  # flux through the TOP of each cell's lower neighbor
    # w-interface fluxes: F[k] at interface below cell k (k=0 bottom)
    # downward flux out of cell k = W*det[k] through its bottom interface,
    # except the bottom cell (k=0): no flux out.
    f_out = flux.at[0].set(0.0)
    f_in = jnp.concatenate([f_out[1:], jnp.zeros_like(f_out[:1])], axis=0)
    d_det = d_det + (f_in - f_out) / jnp.maximum(ctx.hz, EPS)

    d = jnp.stack([d_no3, d_phy, d_zoo, d_det], axis=0)
    d = d * ctx.rmask[None, None]
    return d, saved


def surface_flux(trc, ctx: BGCContext, forc=None):
    # no air-sea exchange for N-based tracers
    return jnp.zeros((4,) + ctx.srflx.shape, trc.dtype)


def init_tracers(cfg, z_r, dtype=jnp.float64):
    """Idealized initial profiles: nutrient-rich at depth, small seed
    populations near the surface."""
    z = jnp.asarray(z_r, dtype)
    no3 = 16.0 * (1.0 - jnp.exp(z / 300.0)) + 0.5
    surf = jnp.exp(z / 50.0)
    phy = 0.2 * surf
    zoo = 0.1 * surf
    det = 0.05 * surf
    return jnp.stack([no3, phy, zoo, det], axis=0).astype(dtype)


@register("npzd")
def build() -> BGCModel:
    return BGCModel(name="npzd",
                    tracer_names=("NO3", "PHYT", "ZOO", "DET"),
                    interior_tendency=interior_tendency,
                    surface_flux=surface_flux,
                    init_tracers=init_tracers)
