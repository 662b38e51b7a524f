"""Orlanski-binding auto-tuning against the parent's baroclinic wave
flux (reference: src/sponge_tune.F adjust_orlanski).

A nested child cannot know a priori how strongly to bind its open
boundaries to the parent data (cfg.ubind): too weak reflects waves, too
strong clamps the interior.  The reference adjusts a PER-POINT binding
velocity ub along each open edge every step by

    ub <- clip(ub +/- alpha * (pflx - cflx),  ub_mn, ub_mx)
    alpha = 0.5 * ub_mx * dt / sp_timscale

(reference: sponge_tune.F:202-246) where pflx is the parent's outward
baroclinic pressure flux at that edge (a forcing time series the parent
run records via upscale/pflx output) and cflx is the child's own flux
from calc_pflx.  The sign flips on north/east edges because outward flux
is positive-up/right there.

The tuned arrays ride in BoundaryData.ub_* and override the scalar
cfg.ubind inside the Orlanski cext terms.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
from flax import struct

from roms_tpu.config import ModelConfig

UB_MAX = 2.0     # (reference: sponge_tune.F:213)
UB_MIN = -1.0


@struct.dataclass
class SpongeTune:
    ub_west: Optional[jax.Array] = None    # (jy,)
    ub_east: Optional[jax.Array] = None
    ub_south: Optional[jax.Array] = None   # (ix,)
    ub_north: Optional[jax.Array] = None


def init_sponge_tune(cfg: ModelConfig, dtype=jnp.float64) -> SpongeTune:
    """Start every open edge at the scalar cfg.ubind."""
    h = cfg.halo
    jy, ix = cfg.ny + 2 * h, cfg.nx + 2 * h
    kw = {}
    for e, n in (("west", jy), ("east", jy), ("south", ix), ("north", ix)):
        if getattr(cfg, f"obc_{e}"):
            kw[f"ub_{e}"] = jnp.full((n,), cfg.ubind, dtype)
    return SpongeTune(**kw)


def adjust_orlanski(tun: SpongeTune, up, vp, pflx: Dict[str, jax.Array],
                    cfg: ModelConfig,
                    sp_timscale: float = 86400.0) -> SpongeTune:
    """One tuning update (reference: sponge_tune.F:202-246).

    up/vp: column-integrated fast pressure fluxes from
    roms_tpu.pflx.calc_pflx; pflx: parent edge series (same units),
    keyed by edge name — missing edges are left untouched.
    """
    alpha = 0.5 * UB_MAX * cfg.dt / sp_timscale

    def upd(ub, cflx, edge, sign):
        if ub is None or edge not in pflx:
            return ub
        new = ub + sign * alpha * (pflx[edge] - cflx)
        return jnp.clip(new, UB_MIN, UB_MAX)

    # child flux sampled one face INSIDE the boundary (reference:
    # comp_cflx pos=2, i.e. up(2,:)/up(nx-1,:) — sampling the BC-written
    # boundary face itself would couple the feedback directly to the
    # tuned parameter); pad-aware on the east/north (padded) sides
    kw = dict(
        ub_west=upd(tun.ub_west, up[:, 3], "west", +1.0),
        ub_east=upd(tun.ub_east, up[:, -4 - cfg.pad_e], "east", -1.0),
        ub_south=upd(tun.ub_south, vp[3, :], "south", +1.0),
        ub_north=upd(tun.ub_north, vp[-4 - cfg.pad_n, :], "north", -1.0))
    return SpongeTune(**kw)


def to_boundary(tun: SpongeTune, bry):
    """Attach the tuned binding velocities to the step's BoundaryData."""
    return bry.replace(ub_west=tun.ub_west, ub_east=tun.ub_east,
                       ub_south=tun.ub_south, ub_north=tun.ub_north)
