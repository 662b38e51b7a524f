"""Vertical (terrain-following S-) coordinate.

Stretching curves and the SM09 transform of the reference
(reference: src/set_scoord.F:1-75, src/set_depth.F:16-125,
set_global_definitions.h:467 VERT_COORD_TYPE_SM09).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def csf(sc: np.ndarray, theta_s: float, theta_b: float) -> np.ndarray:
    """Stretching curve CSF (reference: src/set_scoord.F:52-66, SM2009 Eq. 2.4)."""
    sc = np.asarray(sc, dtype=np.float64)
    if theta_s > 0.0:
        csrf = (1.0 - np.cosh(theta_s * sc)) / (np.cosh(theta_s) - 1.0)
    else:
        csrf = -sc ** 2
    if theta_b > 0.0:
        return (np.exp(theta_b * csrf) - 1.0) / (1.0 - np.exp(-theta_b))
    return csrf


def stretching_curves(nz: int, theta_s: float, theta_b: float):
    """Cs_w (nz+1,) at W-points and Cs_r (nz,) at RHO-points.

    (reference: src/set_scoord.F:16-26; Cs_w[0]=-1, Cs_w[N]=0.)
    """
    ds = 1.0 / nz
    k_w = np.arange(0, nz + 1, dtype=np.float64)
    sc_w = ds * (k_w - nz)
    cs_w = csf(sc_w, theta_s, theta_b)
    cs_w[0] = -1.0
    cs_w[nz] = 0.0
    k_r = np.arange(1, nz + 1, dtype=np.float64)
    sc_r = ds * (k_r - nz - 0.5)
    cs_r = csf(sc_r, theta_s, theta_b)
    return cs_w, cs_r


def set_depth(zeta, h, hinv, cs_w, cs_r, hc: float, nz: int):
    """Moving z-coordinates from the free surface (reference: src/set_depth.F:65-90).

    z_w[k] = zeta + (zeta+h) * (hc*ds*(k-N)     + Cs_w[k]*h) / (h+hc)
    z_r[k] = zeta + (zeta+h) * (hc*ds*(k-N-1/2) + Cs_r[k]*h) / (h+hc)
    Hz[k]  = z_w[k] - z_w[k-1]

    zeta, h, hinv: (..ny.., ..nx..) padded 2D; returns z_w (nz+1, ...),
    z_r (nz, ...), Hz (nz, ...).  hinv = 1/(h+hc) is precomputed once
    (reference: src/set_depth.F:45).
    """
    ds = 1.0 / nz
    k_w = jnp.arange(0, nz + 1, dtype=zeta.dtype)[:, None, None]
    k_r = jnp.arange(1, nz + 1, dtype=zeta.dtype)[:, None, None]
    cff_w = hc * ds * (k_w - nz)
    cff_r = hc * ds * (k_r - nz - 0.5)
    cs_w3 = cs_w[:, None, None]
    cs_r3 = cs_r[:, None, None]
    d = (zeta + h)[None] * hinv[None]
    z_w = zeta[None] + d * (cff_w + cs_w3 * h[None])
    z_w = z_w.at[0].set(-h)  # exact bottom (reference: set_depth.F:68)
    z_r = zeta[None] + d * (cff_r + cs_r3 * h[None])
    hz = z_w[1:] - z_w[:-1]
    return z_w, z_r, hz
