"""Model output: history / running-average / restart files
(reference: src/basic_output.F wrt_his/wrt_avg/wrt_rst_ocean_vars,
src/roms_read_write.F create_file + put_global_atts, src/get_init.F).

Conventions:
  * history & averages: single-precision, ROMS variable names, interior +
    physical-boundary points — xi_rho = nx+2, xi_u = nx+1, eta_rho = ny+2,
    eta_v = ny+1, matching what the reference's `ncjoin` produces from its
    per-rank files (reference: set_global_definitions.h:407-450 history is
    float32, restart float64).
  * restart: full double precision, storing every field of the state pytree
    on the padded grid, so a restarted run is BIT-IDENTICAL to an
    uninterrupted one — the functional-state equivalent of EXACT_RESTART's
    two-record logic (reference: set_global_definitions.h:104-112,
    get_init.F:58-66; our state carries u_prev/t_prev/du_avg* explicitly so
    one record suffices).
  * provenance: the full config as a JSON global attribute plus the repo
    git hash (reference: put_global_atts roms_read_write.F:1544-1716,
    add_git_hash.F).
"""

from __future__ import annotations

import dataclasses
import json
import subprocess
from typing import Optional, Sequence

import numpy as np

from roms_tpu.config import ModelConfig
from roms_tpu.io.netcdf import NCWriter, open_dataset
from roms_tpu.state import OceanState

# physical-region slices on the padded grid (halo=2):
# rho points incl. boundary ring: Fortran 0..n+1 -> py [1:-1]
RHO = slice(1, -1)
# u/v points: Fortran 1..n+1 -> py [2:-1]
UPT = slice(2, -1)

# (name, stagger, long name, units); stagger in {r2,u2,v2,r3,w3,u3,v3}
HIS_MENU = [
    ("zeta", "r2", "free-surface elevation", "meter"),
    ("ubar", "u2", "barotropic XI-velocity", "meter second-1"),
    ("vbar", "v2", "barotropic ETA-velocity", "meter second-1"),
    ("u", "u3", "XI-velocity", "meter second-1"),
    ("v", "v3", "ETA-velocity", "meter second-1"),
    ("w", "w3", "S-coordinate vertical velocity flux (We+Wi)", "meter3 second-1"),
    ("rho", "r3", "density anomaly", "kilogram meter-3"),
    ("akv", "w3", "vertical viscosity", "meter2 second-1"),
    ("hbls", "r2", "KPP surface boundary layer depth", "meter"),
    ("hbbl", "r2", "KPP bottom boundary layer depth", "meter"),
]

TRACER_NAMES = ["temp", "salt"]  # tracer 0, 1; extras are passive_NN


def tracer_name(cfg: ModelConfig, i: int) -> str:
    if i < len(TRACER_NAMES) and (i == 0 or cfg.salinity):
        return TRACER_NAMES[i]
    return f"passive_{i:02d}"


def git_hash() -> str:
    try:
        return subprocess.run(
            ["git", "rev-parse", "HEAD"], capture_output=True, text=True,
            timeout=5, cwd=__file__.rsplit("/", 3)[0]).stdout.strip() or "unknown"
    except Exception:
        return "unknown"


def provenance_attrs(cfg: ModelConfig) -> dict:
    d = dataclasses.asdict(cfg)
    for k, v in list(d.items()):
        if hasattr(v, "value"):
            d[k] = v.value
    return {
        "type": "ROMS-TPU output file",
        "config": json.dumps(d),
        "git_hash": git_hash(),
    }


def _stagger_slices(stagger: str):
    if stagger.startswith("u"):
        return (RHO, UPT)
    if stagger.startswith("v"):
        return (UPT, RHO)
    return (RHO, RHO)


def _dims_for(stagger: str):
    ydim = "eta_v" if stagger.startswith("v") else "eta_rho"
    xdim = "xi_u" if stagger.startswith("u") else "xi_rho"
    if stagger.endswith("3"):
        zdim = "s_w" if stagger.startswith("w") else "s_rho"
        return ("time", zdim, ydim, xdim)
    return ("time", ydim, xdim)


class HistoryWriter:
    """Streaming history (or snapshot) file
    (reference: basic_output.F:273-419 wrt_his_ocean_vars)."""

    def __init__(self, path: str, grid, cfg: ModelConfig,
                 menu: Optional[Sequence] = None, dtype: str = "f4",
                 extra_attrs: Optional[dict] = None):
        self.cfg = cfg
        self.dtype = dtype
        menu = list(menu if menu is not None else HIS_MENU)
        for i in range(cfg.nt):
            menu.append((tracer_name(cfg, i), "r3", f"tracer {i}", ""))
        self.menu = menu
        attrs = provenance_attrs(cfg)
        attrs.update(extra_attrs or {})
        self.nc = NCWriter(path, attrs)
        self.nc.create_dim("time", None)
        self.nc.create_dim("s_rho", cfg.nz)
        self.nc.create_dim("s_w", cfg.nz + 1)
        self.nc.create_dim("eta_rho", cfg.ny + 2)
        self.nc.create_dim("eta_v", cfg.ny + 1)
        self.nc.create_dim("xi_rho", cfg.nx + 2)
        self.nc.create_dim("xi_u", cfg.nx + 1)
        self.nc.create_var("ocean_time", ("time",), "f8",
                           {"long_name": "time since initialization",
                            "units": "second"})
        for name, stg, lname, units in self.menu:
            self.nc.create_var(name, _dims_for(stg), dtype,
                               {"long_name": lname, "units": units})
        # static grid fields for self-describing output
        self.nc.create_var("h", ("eta_rho", "xi_rho"), "f8",
                           {"long_name": "bathymetry", "units": "meter"})
        self.nc.write("h", np.asarray(grid.h)[RHO, RHO])
        self.rec = 0

    def _field(self, state: OceanState, name: str):
        if name == "w":
            return np.asarray(state.we) + np.asarray(state.wi)
        for i in range(self.cfg.nt):
            if name == tracer_name(self.cfg, i):
                return np.asarray(state.t[i])
        return np.asarray(getattr(state, name))

    def write(self, state: OceanState):
        self.nc.write("ocean_time", float(state.time), rec=self.rec)
        for name, stg, _, _ in self.menu:
            a = self._field(state, name)
            jsl, isl = _stagger_slices(stg)
            self.nc.write(name, a[..., jsl, isl].astype(self.dtype),
                          rec=self.rec)
        self.rec += 1
        self.nc.sync()

    def close(self):
        self.nc.close()


class AverageWriter(HistoryWriter):
    """Running time averages written every `navg` steps
    (reference: basic_output.F calc_avg/wrt_avg_ocean_vars)."""

    def __init__(self, path: str, grid, cfg: ModelConfig, navg: int,
                 **kw):
        super().__init__(path, grid, cfg, **kw)
        self.navg = navg
        self._acc = None
        self._count = 0

    def accumulate(self, state: OceanState):
        fields = {name: self._field(state, name).astype(np.float64)
                  for name, *_ in self.menu}
        fields["ocean_time"] = float(state.time)
        if self._acc is None:
            self._acc = fields
        else:
            for k, v in fields.items():
                self._acc[k] = self._acc[k] + v
        self._count += 1
        if self._count == self.navg:
            self._flush()

    def _flush(self):
        inv = 1.0 / self._count
        self.nc.write("ocean_time", self._acc["ocean_time"] * inv,
                      rec=self.rec)
        for name, stg, _, _ in self.menu:
            jsl, isl = _stagger_slices(stg)
            self.nc.write(name,
                          (self._acc[name] * inv)[..., jsl, isl]
                          .astype(self.dtype), rec=self.rec)
        self.rec += 1
        self.nc.sync()
        self._acc = None
        self._count = 0


def write_grid(path: str, grid, cfg: ModelConfig):
    """Write a ROMS-convention grid file (reference: src/grid.F:231-290
    grid-output nccreate section): rho-grid fields incl. boundary ring."""
    nc = NCWriter(path, provenance_attrs(cfg))
    nc.create_dim("eta_rho", cfg.ny + 2)
    nc.create_dim("xi_rho", cfg.nx + 2)
    fields = {
        "h": (grid.h, "bathymetry", "meter"),
        "pm": (grid.pm, "curvilinear metric in XI", "meter-1"),
        "pn": (grid.pn, "curvilinear metric in ETA", "meter-1"),
        "f": (grid.f, "Coriolis parameter", "second-1"),
        "mask_rho": (grid.rmask, "land-sea mask at RHO points", ""),
        "x_rho": (grid.xr, "x coordinate of RHO points", "meter"),
        "y_rho": (grid.yr, "y coordinate of RHO points", "meter"),
    }
    for name, (a, lname, units) in fields.items():
        nc.create_var(name, ("eta_rho", "xi_rho"), "f8",
                      {"long_name": lname, "units": units})
        nc.write(name, np.asarray(a)[RHO, RHO])
    nc.close()


# ===========================================================================
# Exact restart
# ===========================================================================

def write_restart(path: str, state: OceanState, cfg: ModelConfig,
                  grid=None):
    """Full-precision restart of the entire state pytree
    (reference: basic_output.F:517-682 wrt_rst_ocean_vars + EXACT_RESTART)."""
    nc = NCWriter(path, provenance_attrs(cfg))
    h = cfg.halo
    jy, ix = cfg.ny + 2 * h, cfg.nx + 2 * h
    nc.create_dim("eta_pad", jy)
    nc.create_dim("xi_pad", ix)
    nc.create_dim("s_rho", cfg.nz)
    nc.create_dim("s_w", cfg.nz + 1)
    nc.create_dim("tracer", cfg.nt)
    nc.create_dim("n_akt", int(state.akt.shape[0]))
    nc.create_dim("one", 1)

    def dims_of(a):
        m = {jy: "eta_pad", ix: "xi_pad", cfg.nz: "s_rho",
             cfg.nz + 1: "s_w"}
        out = []
        for ax, s in enumerate(a.shape):
            if ax == 0 and a.ndim == 4 and s == cfg.nt:
                out.append("tracer")
            elif ax == 0 and a.ndim == 4 and s == state.akt.shape[0]:
                out.append("n_akt")
            else:
                out.append(m[s])
        return tuple(out)

    for f in dataclasses.fields(state):
        val = getattr(state, f.name)
        if val is None or isinstance(val, dict):
            continue  # optional diagnostics (e.g. upscale capture)
        a = np.asarray(val, np.float64)
        if a.ndim == 0:
            nc.create_var(f.name, ("one",), "f8")
            nc.write(f.name, a.reshape(1))
        else:
            nc.create_var(f.name, dims_of(a), "f8")
            nc.write(f.name, a)
    nc.close()


def read_restart(path: str, cfg: ModelConfig, dtype=None) -> OceanState:
    """Inverse of write_restart (reference: src/get_init.F)."""
    import jax.numpy as jnp
    with open_dataset(path) as ds:
        kw = {}
        for f in dataclasses.fields(OceanState):
            if f.name not in ds:
                continue  # optional fields skipped at write time
            a = np.asarray(ds[f.name][...])
            if f.name == "iic":
                kw[f.name] = jnp.asarray(int(a.reshape(())), jnp.int32)
            elif a.shape == (1,):
                kw[f.name] = jnp.asarray(a.reshape(()),
                                         dtype if dtype else jnp.float64)
            else:
                kw[f.name] = jnp.asarray(a, dtype if dtype else jnp.float64)
    return OceanState(**kw)
