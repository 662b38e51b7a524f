"""Fixed-depth slice output (reference: src/zslice_output.F; offline analog
Tools-Roms/zslice.F + sigma_to_z_intr.F).

`zslice` linearly interpolates a (nz, jy, ix) rho-level field onto fixed
z depths using the moving level depths z_r, masking points below the local
bottom or above the surface.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from roms_tpu.config import ModelConfig

FILL = np.nan


def zslice(field: jax.Array, z_r: jax.Array, depths) -> jax.Array:
    """Interpolate to fixed depths (negative down).  Returns
    (ndepth, jy, ix); NaN where the depth is outside the water column."""
    depths = jnp.atleast_1d(jnp.asarray(depths, field.dtype))
    nz = field.shape[0]

    def one(depth):
        # find k such that z_r[k] <= depth <= z_r[k+1]
        below = jnp.sum((z_r <= depth).astype(jnp.int32), axis=0)  # (jy, ix)
        k = jnp.clip(below - 1, 0, nz - 2)
        zk = jnp.take_along_axis(z_r, k[None], axis=0)[0]
        zk1 = jnp.take_along_axis(z_r, (k + 1)[None], axis=0)[0]
        fk = jnp.take_along_axis(field, k[None], axis=0)[0]
        fk1 = jnp.take_along_axis(field, (k + 1)[None], axis=0)[0]
        w = jnp.where(zk1 > zk, (depth - zk) / (zk1 - zk), 0.0)
        val = fk + jnp.clip(w, 0.0, 1.0) * (fk1 - fk)
        inside = (depth >= z_r[0]) & (depth <= z_r[-1])
        return jnp.where(inside, val, jnp.nan)

    return jax.vmap(one)(depths)


class ZsliceWriter:
    """Streaming z-slice file (reference: src/zslice_output.F)."""

    def __init__(self, path: str, grid, cfg: ModelConfig,
                 depths: Sequence[float],
                 varnames: Sequence[str] = ("temp",)):
        from roms_tpu.io.netcdf import NCWriter
        from roms_tpu.io.output import RHO, provenance_attrs
        self.cfg = cfg
        self.depths = np.asarray(depths, np.float64)
        self.varnames = list(varnames)
        self._rho = RHO
        self.nc = NCWriter(path, provenance_attrs(cfg))
        self.nc.create_dim("time", None)
        self.nc.create_dim("depth", len(depths))
        self.nc.create_dim("eta_rho", cfg.ny + 2)
        self.nc.create_dim("xi_rho", cfg.nx + 2)
        self.nc.create_var("depth", ("depth",), "f8", {"units": "meter"})
        self.nc.write("depth", self.depths)
        self.nc.create_var("ocean_time", ("time",), "f8")
        for v in self.varnames:
            self.nc.create_var(v, ("time", "depth", "eta_rho", "xi_rho"),
                               "f4")
        self.rec = 0

    def write(self, state):
        from roms_tpu.io.output import tracer_name
        self.nc.write("ocean_time", float(state.time), rec=self.rec)
        for v in self.varnames:
            f = None
            for i in range(self.cfg.nt):
                if v == tracer_name(self.cfg, i):
                    f = state.t[i]
            if f is None:
                f = getattr(state, v)
            sl = np.asarray(zslice(f, state.z_r, -np.abs(self.depths)))
            self.nc.write(v, sl[:, self._rho, self._rho].astype(np.float32),
                          rec=self.rec)
        self.rec += 1
        self.nc.sync()

    def close(self):
        self.nc.close()
