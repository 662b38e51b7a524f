"""Experiment assembly: `roms.in` + NetCDF input files -> a runnable model.

This is the parity layer for the reference's full startup path
(reference: src/main.F:86-321 roms_init, src/read_inp_mod.F read_inp,
src/grid.F get_grid, src/get_init.F, src/set_forces.F:90-154 dispatch,
src/roms_read_write.F:654-827 find_new_record multi-file search):

  * parse the runtime input file (keyword registry, roms_tpu.runconfig);
  * load grid + initial state from whole-grid NetCDF files;
  * scan the `forcing:` file list for every recognized forcing variable —
    each variable binds to the first file that contains it, with that
    file's own time axis and cycling, exactly like the reference's
    per-variable record search;
  * build the host-side time-interpolating ForcingSet (surface fluxes OR
    bulk-COARE atmospheric state, open-boundary data incl. per-tracer
    variables, rivers, pipes, tides, BGC deposition, mCDR releases);
  * return a `forcing_fn(time, base, state)` the driver calls every step
    (the set_forces analog).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from roms_tpu.config import ModelConfig
from roms_tpu.forcing import (DAY, DerivedSeries, ForcingSet, Series,
                              StackSeries, pad_field, series_from_dataset)
from roms_tpu.io.input import read_grid, read_init
from roms_tpu.io.netcdf import NCDataset, open_dataset
from roms_tpu.runconfig import RunConfig, read_inp
from roms_tpu.state import Forcing

CP = 3985.0           # (reference: scalars.F:128)
CMDAY2MS = 0.01 / DAY  # cm/day -> m/s (reference: scalars.F cmday2ms)


class FileSet:
    """Open NetCDF forcing files; find each variable in the first file that
    provides it (reference: roms_read_write.F:654-827 find_new_record scans
    the frcfile list per variable)."""

    def __init__(self, paths: Sequence[str]):
        self.paths = list(paths)
        self.datasets: List[NCDataset] = [open_dataset(p) for p in paths]

    def has(self, varname: str) -> bool:
        return any(varname in ds for ds in self.datasets)

    def dataset_of(self, varname: str) -> NCDataset:
        for ds in self.datasets:
            if varname in ds:
                return ds
        raise KeyError(f"variable {varname!r} not found in any forcing file "
                       f"({self.paths})")

    def series(self, varname: str, scale: float = 1.0,
               interp: bool = True) -> Series:
        ds = self.dataset_of(varname)
        return series_from_dataset(ds, varname, scale=scale, interp=interp)

    def close(self):
        for ds in self.datasets:
            ds.close()


@dataclass
class Experiment:
    """Everything `driver.run` needs, assembled from input files."""
    cfg: ModelConfig
    grid: object
    state: object
    forcing0: Forcing          # static parts (rivers/pipes structure, ...)
    forcing_fn: object         # f(time, base, state) -> Forcing
    rc: RunConfig
    tides: Optional[object] = None
    title: str = ""
    output_root: str = "roms"
    fileset: Optional[FileSet] = None

    def run(self, **kw):
        from roms_tpu.driver import run
        return run(self.grid, self.state, self.forcing0, self.cfg,
                   forcing_fn=self.forcing_fn, **kw)

    def run_distributed(self, mesh, **kw):
        """Run this experiment sharded over `mesh`, with the full
        time-dependent forcing path active (record search, two-slot
        interpolation, tides) exactly as in the single-device run
        (reference: set_forces on every rank every step, main.F:385)."""
        from roms_tpu.driver import run_distributed
        return run_distributed(self.grid, self.state, self.forcing0,
                               self.cfg, mesh, forcing_fn=self.forcing_fn,
                               **kw)


def _decode_point_sources(field2d: np.ndarray):
    """Split the reference's combined `value = fraction + 10*index`
    point-source encoding (reference: river_frc.F:150-160, pipe_frc.F:146)."""
    idx = np.floor(field2d / 10.0 + 1e-9).astype(np.int64)
    frc = np.where(idx > 0, field2d - 10.0 * idx, 0.0)
    return frc, idx


def _prepend_zero(a: np.ndarray) -> np.ndarray:
    """Point-source tables are 1-based (index 0 = "no source")."""
    return np.concatenate([np.zeros((1,) + a.shape[1:], a.dtype), a], axis=0)


def assemble(infile: str, base_cfg: ModelConfig,
             tracer_names: Sequence[str] = ("temp", "salt"),
             nz: Optional[int] = None, dtype=None,
             cdr_mode: Optional[str] = None, cdr_file: Optional[str] = None,
             bry_tides: bool = False, pot_tides: bool = True,
             ntides: int = 10) -> Experiment:
    """Build an Experiment from a reference-format runtime input file.

    base_cfg supplies the compile-time switches the reference keeps in
    cppdefs.opt (OBC_*, LMD_KPP, MASKING, ...); grid dims are inferred from
    the grid file; roms.in keywords overlay the rest (reference split:
    param.opt/cppdefs.opt at compile time, roms.in at run time).
    cdr_mode: None | 'parameterized' | 'dp' | '3d'
    (reference: cdr_frc.opt forcing_* switches; cdr_file: cdr_frc.opt
    cdr_file — these live in the .opt file, not roms.in)."""
    import jax.numpy as jnp
    from roms_tpu.ops import kpp

    dtype = dtype or jnp.float64
    rc = read_inp(infile)
    base_dir = os.path.dirname(os.path.abspath(infile))

    def resolve(p):
        return p if os.path.isabs(p) else os.path.join(base_dir, p)

    # ---- grid dims from the grid file (reference: param.opt LLm,MMm) -----
    grid_path = resolve(rc.paths["grid"])
    with open_dataset(grid_path) as ds:
        ny_f, nx_f = ds["h"].shape[-2:]
    cfg = rc.apply(base_cfg).replace(
        nx=nx_f - 2, ny=ny_f - 2, nz=nz or base_cfg.nz,
        nt=len(tracer_names))

    # a MARBL_biogeochemistry block in roms.in requires a BGC-enabled
    # build, exactly like the reference's config check (reference:
    # read_inp_mod.F kwread_marbl + check_setup MARBL switch consistency)
    if rc.paths.get("marbl_namelist") and cfg.bgc_model == "none":
        raise ValueError(
            f"{infile}: MARBL_biogeochemistry block present but the "
            f"compile-time config has bgc_model='none' (reference: "
            f"check_setup errors on MARBL input without the MARBL switch)")

    # cppcheck/srcscheck-grade switch audit (reference: the build-time
    # cppcheck + runtime setup checks; roms_tpu/audit.py)
    from roms_tpu.audit import check_config
    check_config(cfg, strict=True)

    grid = read_grid(grid_path, cfg, dtype=dtype)
    if cfg.sponge:
        from roms_tpu.sponge import set_nudgcof
        grid = set_nudgcof(grid, cfg)

    # ---- initial state ----------------------------------------------------
    nrrec = int(rc.paths.get("nrrec", 1))
    state = read_init(resolve(rc.paths["initial"]), cfg, grid,
                      record=(nrrec - 1 if nrrec >= 1 else -1),
                      tracer_names=tracer_names, dtype=dtype)

    # ---- forcing files -----------------------------------------------------
    fs = FileSet([resolve(p) for p in rc.paths.get("forcing", [])])
    surface: Dict[str, object] = {}
    boundary: Dict[str, object] = {}
    point: Dict[str, object] = {}
    bulk_series: Dict[str, Series] = {}
    bgc_series: Dict[str, Series] = {}
    forcing0 = _zero_forcing_like(cfg, dtype)

    # surface flux mode (reference: flux_frc.F:75-156 unit conversions)
    if fs.has("sustr"):
        r0i = 1.0 / cfg.rho0
        surface["sustr"] = fs.series("sustr", scale=r0i)
        surface["svstr"] = fs.series("svstr", scale=r0i)
        if fs.has("shflux"):
            surface["stflx_0"] = fs.series("shflux", scale=r0i / CP)
        if fs.has("swrad"):
            surface["srflx"] = fs.series("swrad", scale=r0i / CP)
        if fs.has("swflux"):
            # freshwater volume flux, not a salt flux (flux_frc.F:100-103)
            surface["swflx"] = fs.series("swflux", scale=-CMDAY2MS)

    # bulk-COARE mode (reference: bulk_frc.opt variable table)
    if fs.has("uwnd"):
        for nm in ("uwnd", "vwnd", "Tair", "qair", "rain", "lwrad", "swrad"):
            if fs.has(nm):
                bulk_series[nm] = fs.series(nm)

    # climatology file: supplies boundary tracer rows for tracers absent
    # from the bry files (reference: read_inp_mod.F:1025-1036 — clm data
    # is the alternative to BRY for T,S boundary data; applied in
    # t3dbc_im.F TCLIMATOLOGY rows)
    clm_ds = None
    clm_path = rc.paths.get("climatology")
    if clm_path and clm_path != "none":
        clm_ds = open_dataset(resolve(clm_path))

    # open-boundary data (reference: boundary.F:43-75 + per-tracer names)
    for edge in ("west", "east", "south", "north"):
        if not getattr(cfg, f"obc_{edge}"):
            continue
        for var in ("zeta", "ubar", "vbar", "u", "v"):
            name = f"{var}_{edge}"
            if fs.has(name):
                boundary[name] = fs.series(name)
        tser = []
        complete = True
        for nm in tracer_names:
            vn = f"{nm}_{edge}"
            if fs.has(vn):
                tser.append(fs.series(vn))
            elif clm_ds is not None and nm in clm_ds:
                tser.append(_clm_edge_series(clm_ds, nm, edge))
            else:
                complete = False
                tser.append(None)
        if complete and tser:
            boundary[f"t_{edge}"] = StackSeries(tser, name=f"t_{edge}")
        elif any(s is not None for s in tser):
            # per-tracer gaps with no climatology fallback
            raise KeyError(
                f"boundary data for edge {edge} covers only a subset of "
                f"tracers {tracer_names} and no climatology file supplies "
                f"the rest; the reference requires all (boundary.F "
                f"per-tracer set_frc_data / clm_file alternative)")

    # rivers (reference: river_frc.F:46-49; faces decoded from the grid
    # file's river_flux field, :150-280)
    if cfg.river_source:
        from roms_tpu.cases.rivers_ana import build_river_faces
        with open_dataset(grid_path) as ds:
            rflx = pad_field(np.asarray(ds["river_flux"][...], np.float64),
                             cfg)
        rfrc, ridx = _decode_point_sources(rflx)
        rmask_np = np.asarray(grid.rmask, np.float64)
        uflx, vflx = build_river_faces(rmask_np, rfrc, ridx)
        forcing0 = forcing0.replace(riv_uflx=jnp.asarray(uflx, dtype),
                                    riv_vflx=jnp.asarray(vflx, dtype))
        point["riv_vol"] = DerivedSeries(_prepend_zero,
                                         fs.series("river_volume"))
        point["riv_trc"] = DerivedSeries(
            lambda a: _prepend_zero(np.atleast_2d(a).T),
            fs.series("river_tracer"))

    # pipes (reference: pipe_frc.F:39-42 series + :115-116 location fields,
    # fixed bottom-two-level profile set_pipe_vert_prf)
    if cfg.pipe_source:
        pds = fs.dataset_of("pipe_volume")
        pidx = pad_field(np.asarray(pds["pipe_index"][...], np.float64), cfg)
        pfrac = pad_field(np.asarray(pds["pipe_fraction"][...], np.float64),
                          cfg)
        pidx = np.where(pfrac > 0.0, pidx, 0.0).astype(np.int32)
        npip = int(pidx.max())
        prf = np.zeros((npip + 1, cfg.nz))
        prf[1:, 0] = 0.5
        prf[1:, 1] = 0.5
        forcing0 = forcing0.replace(
            pipe_idx=jnp.asarray(pidx),
            pipe_prf=jnp.asarray(prf, dtype))
        vol_s = fs.series("pipe_volume")
        point["pipe_flx"] = DerivedSeries(
            lambda v: pfrac * _prepend_zero(np.atleast_1d(v))[pidx],
            vol_s)
        point["pipe_trc"] = DerivedSeries(
            lambda a: _prepend_zero(np.atleast_2d(a).T),
            fs.series("pipe_tracer"))

    # tides (reference: tides.F:285-342)
    tidal = None
    if (bry_tides or pot_tides) and fs.has("omega"):
        tidal = _load_tides(fs, cfg, ntides, bry_tides, pot_tides, dtype)

    # BGC atmospheric deposition / gas forcing (reference: bgc.opt,
    # src/bgc_forces.F)
    for nm in ("dust", "iron", "pco2_air", "pco2_air_alt", "nox", "nhy",
               "swrad_LFreq"):
        if fs.has(nm):
            bgc_series[nm] = fs.series(nm)

    # mCDR releases (reference: cdr_frc.F three forcing modes)
    cdr_static, cdr_flx_series = None, None
    if cdr_mode is not None:
        cdr_static, cdr_flx_series = _load_cdr(
            resolve(cdr_file), cdr_mode, cfg, grid, state, tracer_names,
            dtype)

    fset = ForcingSet(cfg, surface=surface, boundary=boundary, point=point,
                      dtype=dtype)

    def forcing_fn(t, base, st=None):
        frc = fset.at(t, base)
        if bulk_series:
            frc = _apply_bulk(frc, bulk_series, t, st, grid, cfg, dtype)
        if tidal is not None:
            from roms_tpu.tides import set_tides
            bry_out, ptide = set_tides(tidal, jnp.asarray(t, dtype), cfg,
                                       bry=frc.bry)
            frc = frc.replace(bry=bry_out, ptide=ptide)
        if bgc_series:
            frc = frc.replace(bgc={
                nm: jnp.asarray(pad_field(np.atleast_2d(s.value(t)), cfg),
                                dtype)
                for nm, s in bgc_series.items()})
        if cdr_static is not None:
            cdr = cdr_static
            if cdr_flx_series is not None:
                flx = np.atleast_2d(cdr_flx_series.value(t)).T  # (ncdr, nt)
                cdr = cdr.replace(flx=jnp.asarray(flx, dtype))
            frc = frc.replace(cdr=cdr)
        return frc

    # run_distributed gathers a surface-state view for 3-arg hooks only
    # when the hook actually reads it; only the bulk path does here.
    forcing_fn.needs_state = bool(bulk_series)

    return Experiment(cfg=cfg, grid=grid, state=state, forcing0=forcing0,
                      forcing_fn=forcing_fn, rc=rc, tides=tidal,
                      title=rc.paths.get("title", ""),
                      output_root=rc.paths.get("output_root", "roms"),
                      fileset=fs)


def _zero_forcing_like(cfg, dtype):
    from roms_tpu.state import zero_forcing
    return zero_forcing(cfg, dtype)


# On the joined-file (n+2) layout the boundary ring itself is column 0
# (west) / -1 (east) and row 0 (south) / -1 (north): the reference
# applies tclm(istr-1)/tclm(iend+1)/tclm(jstr-1)/tclm(jend+1)
# (t3dbc_im.F:158,233,301), i.e. the ring value, not the first interior
# value.
_CLM_EDGE_SLICE = {
    "west": (Ellipsis, slice(None), 0),
    "east": (Ellipsis, slice(None), -1),
    "south": (Ellipsis, 0, slice(None)),
    "north": (Ellipsis, -1, slice(None)),
}


def _clm_edge_series(ds, varname: str, edge: str) -> Series:
    """Boundary-row series sliced per record from a whole-grid climatology
    field (reference: tclm rows consumed by t3dbc_im.F:158,233,301; the
    clm file is the whole-domain alternative to perimeter BRY data,
    read_inp_mod.F:1026-1034).  Slicing happens at record granularity so
    only two time slots of the 3D field are ever resident."""
    from roms_tpu.forcing import series_from_dataset

    var = ds[varname]
    tname = var.dims[0]
    tvar = ds[tname]
    times = np.asarray(tvar[...], np.float64) * DAY
    cyc = tvar.attrs.get("cycle_length")
    cycle = (float(np.asarray(cyc).reshape(())) * DAY
             if cyc is not None else None)
    sl = _CLM_EDGE_SLICE[edge]

    def read(i):
        return np.asarray(var[i], np.float64)[sl]

    return Series(times, read, cycle=cycle, name=f"clm:{varname}_{edge}")


def _apply_bulk(frc: Forcing, bulk_series, t, st, grid, cfg, dtype):
    """COARE bulk fluxes from interpolated atmospheric state + model SST
    (reference: set_forces.F -> bulk_frc.F set_bulk_frc)."""
    import jax.numpy as jnp
    from roms_tpu.ops.bulk import bulk_flux

    v = {nm: jnp.asarray(pad_field(np.atleast_2d(s.value(t)), cfg), dtype)
         for nm, s in bulk_series.items()}
    sst = st.t[cfg.itemp, -1]
    fx = bulk_flux(v["uwnd"], v["vwnd"], v["Tair"], v["qair"], v["rain"],
                   v["lwrad"], v["swrad"], sst,
                   st.u[-1], st.v[-1], grid, cfg)
    stflx = frc.stflx.at[cfg.itemp].set(fx.stflx_temp)
    # expose the 10 m wind speed for gas exchange (reference:
    # bec2_driver.F:186-188 BULK_FRC branch uses wspd directly)
    bgc = dict(frc.bgc) if frc.bgc else {}
    bgc["wspd"] = jnp.sqrt(v["uwnd"] ** 2 + v["vwnd"] ** 2)
    return frc.replace(sustr=fx.sustr, svstr=fx.svstr, stflx=stflx,
                       srflx=fx.srflx, swflx=fx.swflx, bgc=bgc)


def _load_tides(fs: FileSet, cfg, ntides, bry_tides, pot_tides, dtype):
    import jax.numpy as jnp
    from roms_tpu.tides import TidalForcing

    ds = fs.dataset_of("omega")
    om = np.asarray(ds["omega"][...], np.float64)[:ntides]

    def fld(nm):
        a = np.asarray(ds[nm][...], np.float64)[:ntides]
        return jnp.asarray(pad_field(a, cfg), dtype)

    kw = dict(ftide=jnp.asarray(om, dtype))
    if pot_tides and "pot_Re" in ds:
        kw.update(ptide_re=fld("pot_Re"), ptide_im=fld("pot_Im"))
    if bry_tides and "ssh_Re" in ds:
        kw.update(ztide_re=fld("ssh_Re"), ztide_im=fld("ssh_Im"),
                  utide_re=fld("u_Re"), utide_im=fld("u_Im"),
                  vtide_re=fld("v_Re"), vtide_im=fld("v_Im"))
    return TidalForcing(**kw)


def _load_cdr(path: str, mode: str, cfg, grid, state, tracer_names, dtype):
    """Build CdrForcing from a cdr forcing file
    (reference: cdr_frc.F:111-114 3D, :189-243 dp, :264-292 parameterized).

    Returns (static CdrForcing, per-step tracer-flux Series or None)."""
    from roms_tpu import cdr as cdrmod

    names = list(tracer_names)
    with open_dataset(path) as ds:
        if mode == "parameterized":
            lon = np.atleast_1d(np.asarray(ds["cdr_lon"][...], np.float64))
            lat = np.atleast_1d(np.asarray(ds["cdr_lat"][...], np.float64))
            dep = np.atleast_1d(np.asarray(ds["cdr_dep"][...], np.float64))
            hsc = np.atleast_1d(np.asarray(ds["cdr_hsc"][...], np.float64))
            vsc = np.atleast_1d(np.asarray(ds["cdr_vsc"][...], np.float64))
            flx0 = np.zeros((len(lon), cfg.nt))
            static = cdrmod.parameterized_releases(
                cfg, grid, state.z_r, state.hz, lon, lat, dep, hsc, vsc,
                flx0, dtype=dtype)
            flx_series = series_from_dataset(ds, "cdr_trcflx", interp=False)
            return static, flx_series
        if mode == "dp":
            lon = np.atleast_1d(np.asarray(ds["cdr_lon"][...], np.float64))
            lat = np.atleast_1d(np.asarray(ds["cdr_lat"][...], np.float64))
            hz_src = np.asarray(ds["cdr_layer_thickness"][0], np.float64).T
            prof = np.asarray(ds["cdr_trcflx_profile"][0], np.float64)
            # file layout (n_src, nrows, ncdr) -> (ncdr, nrows, n_src)
            prof = np.transpose(prof, (2, 1, 0))
            ialk = names.index("ALK") if "ALK" in names else cfg.nt - 2
            idic = names.index("DIC") if "DIC" in names else cfg.nt - 1
            static = cdrmod.profile_releases(
                cfg, grid, state.hz, lon, lat, hz_src, prof,
                tracer_indices=(ialk, idic), dtype=dtype)
            return static, None
        if mode == "3d":
            import jax.numpy as jnp
            ialk = names.index("ALK") if "ALK" in names else cfg.nt - 2
            idic = names.index("DIC") if "DIC" in names else cfg.nt - 1
            alk = pad_field(np.asarray(ds["cdr_trcflx_3d_ALK"][0],
                                       np.float64), cfg)
            dic = pad_field(np.asarray(ds["cdr_trcflx_3d_DIC"][0],
                                       np.float64), cfg)
            flx3 = np.zeros((cfg.nt,) + alk.shape)
            flx3[ialk] = alk
            flx3[idic] = dic
            return cdrmod.cdr_3d(cfg, flx3, dtype=dtype), None
    raise ValueError(f"unknown cdr mode {mode!r}")
