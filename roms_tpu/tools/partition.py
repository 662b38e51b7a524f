"""partit / ncjoin: split and join whole-grid NetCDF files over an
NP_XI x NP_ETA processor grid (reference: Tools-Roms/partit.F,
Tools-Roms/ncjoin.F, Tools-Roms/ncjoin_mpi.F).

The model itself reads whole-grid files directly (roms_tpu.io.input), so
these tools exist for interoperability with reference workflows: producing
per-rank inputs for the Fortran model and re-assembling per-rank outputs.

Conventions follow the reference:
  * partitionable dims: xi_rho, xi_u, eta_rho, eta_v
    (reference: partit.F:290-345)
  * each per-node file carries the global int attribute
    `partition = [node, nnodes, xi_start, eta_start]` (1-based start of
    the node's block inside the global xi_rho/eta_rho index space;
    reference: partit.F:473-480)
  * non-partitionable variables are copied redundantly into every file
    (reference: partit.F:34-39)

The block decomposition mirrors partit's mpi_setup: interior nodes get
ceil(LLm/NP) interior points and the first/last nodes absorb the remainder
and the physical boundary ring (reference: partit.F mpi_setup).
`ncjoin` trusts each file's `partition` attribute and actual dimension
sizes, so it reassembles any consistently-written partition.
"""

from __future__ import annotations

import os
from typing import Dict, List, Tuple

import numpy as np

from roms_tpu.io.netcdf import NCWriter, open_dataset

PART_X = ("xi_rho", "xi_u")
PART_E = ("eta_rho", "eta_v")


def node_blocks(np_xi: int, np_eta: int, llm: int, mmm: int):
    """Per-node interior blocks: list of (inode, jnode, i0, i1, j0, j1)
    with 0-based global INTERIOR indices [i0, i1) (reference:
    partit.F mpi_setup block sizing: interior = ceil(n/np), edges absorb
    the remainder)."""
    def split(n, p):
        base = (n + p - 1) // p
        off = p * base - n
        # distribute: first node loses off//2, last loses (off+1)//2
        sizes = [base] * p
        sizes[0] -= off // 2
        sizes[-1] -= (off + 1) // 2
        starts = np.concatenate([[0], np.cumsum(sizes)[:-1]])
        return list(zip(starts.tolist(), sizes))

    xs = split(llm, np_xi)
    es = split(mmm, np_eta)
    out = []
    for jn in range(np_eta):
        for in_ in range(np_xi):
            i0, isz = xs[in_]
            j0, jsz = es[jn]
            out.append((in_, jn, i0, i0 + isz, j0, j0 + jsz))
    return out


def _var_slices(dims: Tuple[str, ...], blk, np_xi, np_eta, llm, mmm):
    """Global index slice per dim for one node, handling staggered dims and
    boundary-ring attachment on edge nodes."""
    in_, jn, i0, i1, j0, j1 = blk
    sl = []
    for d in dims:
        if d == "xi_rho":       # global size llm+2, interior at 1..llm
            a = i0 + 1 - (1 if in_ == 0 else 0)
            b = i1 + 1 + (1 if in_ == np_xi - 1 else 0)
            sl.append(slice(a, b))
        elif d == "xi_u":       # global size llm+1, u points 1..llm+1->0..llm
            a = i0 if in_ == 0 else i0
            b = i1 + (1 if in_ == np_xi - 1 else 0)
            sl.append(slice(a, b))
        elif d == "eta_rho":
            a = j0 + 1 - (1 if jn == 0 else 0)
            b = j1 + 1 + (1 if jn == np_eta - 1 else 0)
            sl.append(slice(a, b))
        elif d == "eta_v":
            a = j0 if jn == 0 else j0
            b = j1 + (1 if jn == np_eta - 1 else 0)
            sl.append(slice(a, b))
        else:
            sl.append(slice(None))
    return tuple(sl)


def partit(path: str, np_xi: int, np_eta: int,
           out_dir: str | None = None) -> List[str]:
    """Split one whole-grid file into np_xi*np_eta per-node files named
    <stem>.<node>.nc (reference: partit.F)."""
    with open_dataset(path) as ds:
        if "partition" in ds.attrs:
            raise ValueError(f"{path} is already a partitioned file")
        dims = ds.dimensions
        if "xi_rho" in dims:
            llm = dims["xi_rho"] - 2
        elif "xi_u" in dims:
            llm = dims["xi_u"] - 1
        else:
            raise ValueError(f"{path}: no partitionable xi dimension")
        if "eta_rho" in dims:
            mmm = dims["eta_rho"] - 2
        elif "eta_v" in dims:
            mmm = dims["eta_v"] - 1
        else:
            raise ValueError(f"{path}: no partitionable eta dimension")

        stem, ext = os.path.splitext(path)
        if out_dir:
            stem = os.path.join(out_dir, os.path.basename(stem))
        blocks = node_blocks(np_xi, np_eta, llm, mmm)
        nnodes = np_xi * np_eta
        names = []
        for node, blk in enumerate(blocks):
            in_, jn = blk[0], blk[1]
            fname = f"{stem}.{node}{ext or '.nc'}"
            names.append(fname)
            # per-node dimension sizes from a probe slice
            dimsz: Dict[str, int] = dict(dims)
            for d in ("xi_rho", "xi_u", "eta_rho", "eta_v"):
                if d in dims:
                    s = _var_slices((d,), blk, np_xi, np_eta, llm, mmm)[0]
                    dimsz[d] = s.stop - s.start
            attrs = dict(ds.attrs)
            w = NCWriter(fname, attrs)
            # 1-based global start of this node's xi_rho/eta_rho block
            xi_start = (blk[2] + 1 - (1 if in_ == 0 else 0)) + 1
            eta_start = (blk[4] + 1 - (1 if jn == 0 else 0)) + 1
            w._f.partition = np.asarray(
                [node, nnodes, xi_start, eta_start], np.int32)
            rec_dim = next((k for k, v in dims.items() if v in (-1, None)
                            or k in ("time", "ocean_time")), None)
            for dname, dsz in dimsz.items():
                w.create_dim(dname, None if dname == rec_dim else int(dsz))
            for vname, var in ds.variables.items():
                w.create_var(vname, var.dims,
                             np.dtype(var.dtype).str[1:], var.attrs)
                sl = _var_slices(var.dims, blk, np_xi, np_eta, llm, mmm)
                data = np.asarray(var[...])[sl]
                if (rec_dim is not None and var.dims
                        and var.dims[0] == rec_dim):
                    # unlimited-dim vars write record-by-record (the
                    # scipy backend cannot whole-array-assign them)
                    for r in range(data.shape[0]):
                        w.write(vname, data[r], rec=r)
                else:
                    w.write(vname, data)
            w.close()
    return names


def ncjoin(paths: List[str], out_path: str) -> str:
    """Join per-node files back into one whole-grid file
    (reference: Tools-Roms/ncjoin.F).  Placement uses each file's
    `partition` attribute + its actual dimension sizes."""
    parts = []
    for p in paths:
        ds = open_dataset(p)
        if "partition" not in ds.attrs:
            raise ValueError(f"{p}: missing 'partition' attribute")
        parts.append((np.asarray(ds.attrs["partition"], np.int64), ds))
    parts.sort(key=lambda t: t[0][0])
    nnodes = int(parts[0][0][1])
    if len(parts) != nnodes:
        raise ValueError(f"need {nnodes} files, got {len(parts)}")

    # global sizes: max over nodes of start-1 + local size
    def gsize(dim_rho: str, start_col: int):
        return max(int(a[start_col] - 1) + ds.dimensions[dim_rho]
                   for a, ds in parts if dim_rho in ds.dimensions)

    g_xi_rho = gsize("xi_rho", 2) if "xi_rho" in parts[0][1].dimensions else 0
    g_eta_rho = gsize("eta_rho", 3) if "eta_rho" in parts[0][1].dimensions else 0

    dims0 = dict(parts[0][1].dimensions)
    gdims = dict(dims0)
    if g_xi_rho:
        gdims["xi_rho"] = g_xi_rho
        gdims["xi_u"] = g_xi_rho - 1
    if g_eta_rho:
        gdims["eta_rho"] = g_eta_rho
        gdims["eta_v"] = g_eta_rho - 1

    attrs = {k: v for k, v in parts[0][1].attrs.items() if k != "partition"}
    w = NCWriter(out_path, attrs)
    rec_dim = next((k for k in dims0 if k in ("time", "ocean_time")), None)
    for dname, dsz in gdims.items():
        w.create_dim(dname, None if dname == rec_dim else int(dsz))

    def put(vname, var0, data):
        # unlimited-dim variables must be written record-by-record
        # (the scipy netcdf backend cannot whole-array-assign them)
        if rec_dim is not None and var0.dims and var0.dims[0] == rec_dim:
            for r in range(data.shape[0]):
                w.write(vname, data[r], rec=r)
        else:
            w.write(vname, data)

    for vname, var0 in parts[0][1].variables.items():
        w.create_var(vname, var0.dims, np.dtype(var0.dtype).str[1:],
                     var0.attrs)
        shape = tuple(s if d == rec_dim else
                      (gdims[d] if d in gdims else s)
                      for d, s in zip(var0.dims, var0.shape))
        if not any(d in PART_X + PART_E for d in var0.dims):
            put(vname, var0, np.asarray(var0[...]))
            continue
        canvas = np.zeros(shape, np.dtype(var0.dtype))
        for attr, ds in parts:
            var = ds[vname]
            xi0 = int(attr[2]) - 1
            eta0 = int(attr[3]) - 1
            sl = []
            for d, s in zip(var.dims, var.shape):
                if d in PART_X:
                    # xi_u blocks start one left of xi_rho except node col 0
                    off = xi0 if d == "xi_rho" else (xi0 - 1 if xi0 > 0 else 0)
                    sl.append(slice(off, off + s))
                elif d in PART_E:
                    off = eta0 if d == "eta_rho" else (eta0 - 1 if eta0 > 0 else 0)
                    sl.append(slice(off, off + s))
                else:
                    sl.append(slice(None))
            canvas[tuple(sl)] = np.asarray(var[...])
        put(vname, var0, canvas)
    w.close()
    for _, ds in parts:
        ds.close()
    return out_path


def ncjoin_parallel(paths: List[str], out_path: str,
                    workers: int | None = None) -> str:
    """Parallel join — the `ncjoin_mpi` role (reference:
    Tools-Roms/ncjoin_mpi.F:1-40; documented 8-16x speedups over serial
    ncjoin, Documentation/readme-tools/readme.ncjoin_mpi:46-48).

    Same semantics as `ncjoin`, parallelized at (variable, node-file)
    granularity: the classic-netcdf reader holds each part fully in
    memory (scipy netcdf_file mmap=False), so concurrent read-only jobs
    need no locks; each job converts its node's block (the big-endian ->
    native byteswap + copy that dominates serial ncjoin) and fills its
    disjoint slice of a preallocated global canvas.  The canvases then
    stream to the output serially (the scipy netcdf backend is not
    thread-safe for record variables).  All canvases are resident at
    once — peak memory equals the joined file size."""
    from concurrent.futures import ThreadPoolExecutor

    if workers is None:
        workers = min(16, (os.cpu_count() or 1) * 2)

    # header pass: partition layout + metadata from cheap opens
    heads = []
    for p in paths:
        ds = open_dataset(p)
        if "partition" not in ds.attrs:
            raise ValueError(f"{p}: missing 'partition' attribute")
        heads.append((np.asarray(ds.attrs["partition"], np.int64), p, ds))
    heads.sort(key=lambda t: t[0][0])
    nnodes = int(heads[0][0][1])
    if len(heads) != nnodes:
        raise ValueError(f"need {nnodes} files, got {len(heads)}")

    def gsize(dim_rho: str, start_col: int):
        return max(int(a[start_col] - 1) + ds.dimensions[dim_rho]
                   for a, _, ds in heads if dim_rho in ds.dimensions)

    ds0 = heads[0][2]
    dims0 = dict(ds0.dimensions)
    gdims = dict(dims0)
    if "xi_rho" in dims0:
        g_xi = gsize("xi_rho", 2)
        gdims["xi_rho"] = g_xi
        gdims["xi_u"] = g_xi - 1
    if "eta_rho" in dims0:
        g_eta = gsize("eta_rho", 3)
        gdims["eta_rho"] = g_eta
        gdims["eta_v"] = g_eta - 1
    rec_dim = next((k for k in dims0 if k in ("time", "ocean_time")), None)

    def block_slices(var, attr):
        xi0 = int(attr[2]) - 1
        eta0 = int(attr[3]) - 1
        sl = []
        for d, s in zip(var.dims, var.shape):
            if d in PART_X:
                off = xi0 if d == "xi_rho" else (xi0 - 1 if xi0 > 0 else 0)
                sl.append(slice(off, off + s))
            elif d in PART_E:
                off = eta0 if d == "eta_rho" else (eta0 - 1 if eta0 > 0 else 0)
                sl.append(slice(off, off + s))
            else:
                sl.append(slice(None))
        return tuple(sl)

    part_names = [v for v, var in ds0.variables.items()
                  if any(d in PART_X + PART_E for d in var.dims)]

    attrs = {k: v for k, v in ds0.attrs.items() if k != "partition"}
    w = NCWriter(out_path, attrs)
    for dname, dsz in gdims.items():
        w.create_dim(dname, None if dname == rec_dim else int(dsz))

    def put(vname, var0, data):
        if rec_dim is not None and var0.dims and var0.dims[0] == rec_dim:
            for r in range(data.shape[0]):
                w.write(vname, data[r], rec=r)
        else:
            w.write(vname, data)

    # create every variable; PRESIZE record variables so their backing
    # arrays are stable, then let the fill jobs write node blocks
    # DIRECTLY into the writer's (big-endian) arrays — one parallel
    # byteswap+copy instead of canvas copy + serial writer copy
    targets = {}
    for vname, var0 in ds0.variables.items():
        wv = w.create_var(vname, var0.dims,
                          np.dtype(var0.dtype).str[1:], var0.attrs)
        if vname not in part_names:
            put(vname, var0, np.asarray(var0[...]))
            continue
        if rec_dim is not None and var0.dims and var0.dims[0] == rec_dim:
            nrec = var0.shape[0]
            gshape = tuple(gdims[d] if d in gdims else s
                           for d, s in zip(var0.dims[1:], var0.shape[1:]))
            w.write(vname, np.zeros(gshape, np.dtype(var0.dtype)),
                    rec=nrec - 1)
        targets[vname] = wv.data

    def fill(job):
        vname, (attr, _, ds) = job
        var = ds[vname]
        targets[vname][block_slices(var, attr)] = np.asarray(var[...])

    jobs = [(v, h) for v in part_names for h in heads]
    with ThreadPoolExecutor(workers) as ex:
        list(ex.map(fill, jobs))

    w.close()
    for _, _, ds in heads:
        ds.close()
    return out_path


def nc3to4z(path: str, out_path: str, complevel: int = 4) -> str:
    """NetCDF-3 -> compressed NetCDF-4/HDF5 (reference: Tools-Roms/nc3to4z.F)."""
    import h5py
    with open_dataset(path) as ds, h5py.File(out_path, "w") as f:
        for k, v in ds.attrs.items():
            f.attrs[k] = v
        for vname, var in ds.variables.items():
            data = np.asarray(var[...])
            d = f.create_dataset(vname, data=data, compression="gzip",
                                 compression_opts=complevel,
                                 chunks=True if data.ndim else None)
            for k, v in var.attrs.items():
                d.attrs[k] = v
            d.attrs["dims"] = ",".join(var.dims)
    return out_path


def _main(argv=None):
    import argparse
    import sys
    p = argparse.ArgumentParser(prog="roms_tpu.tools.partition")
    sub = p.add_subparsers(dest="cmd", required=True)
    sp = sub.add_parser("partit", help="split whole-grid files (partit.F)")
    sp.add_argument("np_xi", type=int)
    sp.add_argument("np_eta", type=int)
    sp.add_argument("files", nargs="+")
    sj = sub.add_parser("ncjoin", help="join per-node files (ncjoin.F)")
    sj.add_argument("out")
    sj.add_argument("files", nargs="+")
    sz = sub.add_parser("nc3to4z", help="compress to NetCDF4 (nc3to4z.F)")
    sz.add_argument("infile")
    sz.add_argument("outfile")
    a = p.parse_args(argv)
    if a.cmd == "partit":
        for f in a.files:
            for name in partit(f, a.np_xi, a.np_eta):
                print(name)
    elif a.cmd == "ncjoin":
        print(ncjoin(a.files, a.out))
    else:
        print(nc3to4z(a.infile, a.outfile))
    return 0


if __name__ == "__main__":
    import sys
    sys.exit(_main())
