"""End-to-end two-domain (parent/child) nesting flow, Iceland-style
(reference: Examples/Iceland/{Iceland_parent,Iceland_child,
Iceland_parent_with_upscaling}; src/extract_data.F, Tools-Roms/r2r_bry.F,
src/sponge_tune.F, src/upscale_output.F):

  parent run with boundary EXTRACT objects at the child perimeter
    -> child bathymetry blended onto the parent (match_topo)
    -> child boundary series from the extract file (r2r-style)
    -> child run with Orlanski OBC bound to the parent data,
       sponge auto-tuning active (calc_pflx child vs parent flux),
       upscale capture on
    -> captured boundary tracer fluxes conserve the child tracer
       content to round-off
    -> captured fluxes re-force the PARENT as a dense CDR-style source
       (Iceland_parent_with_upscaling), raising its tracer content by
       exactly the injected amount.
"""

import jax.numpy as jnp
import numpy as np

from roms_tpu.cases import obc_basin
from roms_tpu.driver import run
from roms_tpu.io.extract import ExtractObject, ExtractWriter
from roms_tpu.io.netcdf import open_dataset
from roms_tpu.pflx import calc_pflx, init_pflx
from roms_tpu.sponge_tune import adjust_orlanski, init_sponge_tune, to_boundary
from roms_tpu.state import zero_boundary
from roms_tpu.tools.nesting import interp_at, locate_in_grid, match_topo

DX = 1000.0          # parent grid spacing (obc_basin.DX)
NP = 32              # parent interior
NC = 32              # child interior (2x refinement of the central half)
NZ = 6
NSTEPS = 8


def _parent_run(tmp_path):
    cfg = obc_basin.config("radiating", ntimes=NSTEPS).replace(
        nx=NP, ny=NP, nz=NZ, ndtfast=20)
    grid, st, frc = obc_basin.setup(cfg)

    # child perimeter in parent physical coordinates: central box
    # [NP/4, 3NP/4] x dx, refined 2x -> child cell centres
    x0 = 0.25 * NP * DX
    dxc = 0.5 * DX
    cc = x0 + dxc * (np.arange(NC) + 0.5)          # child interior centres
    edges = {
        "west": (np.full(NC, cc[0]), cc),
        "east": (np.full(NC, cc[-1]), cc),
        "south": (cc, np.full(NC, cc[0])),
        "north": (cc, np.full(NC, cc[-1])),
    }
    xr = np.asarray(grid.xr)
    yr = np.asarray(grid.yr)
    objects = []
    for name, (ex, ey) in edges.items():
        px, py = locate_in_grid(xr, yr, ex, ey)
        objects.append(ExtractObject(name, px, py))

    path = str(tmp_path / "parent_extract.nc")
    ew = ExtractWriter(path, objects, cfg,
                       varnames=("zeta", "ubar", "vbar", "temp"))

    # parent fast pressure-flux series at the child edges (sponge_tune's
    # parent-side input, reference: sponge_tune.F comp_cflx on the parent)
    pf = init_pflx(cfg)
    pflx_recs = []

    def hook(s, i):
        nonlocal pf
        ew.write(s, grid)
        pf, up, vp = calc_pflx(pf, s, grid, cfg, timescale=4 * cfg.dt)
        rec = {}
        for name, (ex, ey) in edges.items():
            f2d = up if name in ("west", "east") else vp
            px, py = locate_in_grid(xr, yr, ex, ey)
            rec[name] = interp_at(np.asarray(f2d)[None], px, py)[0]
        pflx_recs.append(rec)

    st_end, _ = run(grid, st, frc, cfg, nsteps=NSTEPS, step_hook=hook)
    ew.close()
    return cfg, grid, st_end, path, pflx_recs, edges


def _child_domain():
    cfg = obc_basin.config("radiating", ntimes=NSTEPS).replace(
        nx=NC, ny=NC, nz=NZ, dt=30.0, ndtfast=20)
    grid, st, frc = obc_basin.setup(cfg)
    return cfg, grid, st, frc


def test_nested_parent_child_upscale(tmp_path):
    p_cfg, p_grid, _, extract_path, pflx_recs, edges = _parent_run(tmp_path)

    c_cfg, c_grid, c_st, c_frc = _child_domain()
    jyc, ixc = c_cfg.ny + 4, c_cfg.nx + 4

    # ---- match_topo: blend a perturbed child bathymetry onto the parent
    # interpolation near the boundary (reference: Tools-Roms match_topo)
    xr_p = np.asarray(p_grid.xr)
    yr_p = np.asarray(p_grid.yr)
    x0 = 0.25 * NP * DX
    dxc = 0.5 * DX
    ccf = x0 + dxc * (np.arange(-2, NC + 2) + 0.5)   # padded child centres
    cx, cy = np.meshgrid(ccf, ccf)
    px, py = locate_in_grid(xr_p, yr_p, cx.ravel(), cy.ravel())
    h_parent_on_child = interp_at(np.asarray(p_grid.h)[None], px,
                                  py)[0].reshape(jyc, ixc)
    rng = np.random.default_rng(0)
    h_child = h_parent_on_child * (1.0 + 0.05 * rng.standard_normal(
        (jyc, ixc)))
    h_blend = match_topo(h_child, h_parent_on_child,
                         np.ones((jyc, ixc)), width=6)
    # at the forced boundary the child equals the parent; far interior
    # keeps the child
    np.testing.assert_allclose(h_blend[0, :], h_parent_on_child[0, :],
                               rtol=1e-12)
    assert np.abs(h_blend[10:-10, 10:-10]
                  - h_child[10:-10, 10:-10]).max() < 1e-12 * 100.0

    # ---- child boundary series from the parent extract file ------------
    with open_dataset(extract_path) as ds:
        times = np.asarray(ds["ocean_time"][...])
        series = {}
        for e in edges:
            series[e] = {
                "zeta": np.asarray(ds[f"{e}_zeta"][...]),
                "ubar": np.asarray(ds[f"{e}_ubar"][...]),
                "vbar": np.asarray(ds[f"{e}_vbar"][...]),
                "temp": np.asarray(ds[f"{e}_temp"][...]),
            }

    tun = init_sponge_tune(c_cfg)

    def pad_edge(vals):
        # child edge arrays cover the NC interior points; pad to jy/ix+4
        out = np.empty(vals.shape[:-1] + (vals.shape[-1] + 4,))
        out[..., 2:-2] = vals
        out[..., :2] = vals[..., :1]
        out[..., -2:] = vals[..., -1:]
        return out

    def bry_at(t):
        r = np.clip(np.searchsorted(times, t) - 1, 0, len(times) - 2)
        w = np.clip((t - times[r]) / max(times[r + 1] - times[r], 1e-30),
                    0.0, 1.0)
        kw = {}
        for e in edges:
            sv = series[e]
            z = (1 - w) * sv["zeta"][r] + w * sv["zeta"][r + 1]
            ub = (1 - w) * sv["ubar"][r] + w * sv["ubar"][r + 1]
            vb = (1 - w) * sv["vbar"][r] + w * sv["vbar"][r + 1]
            tm = (1 - w) * sv["temp"][r] + w * sv["temp"][r + 1]
            nrm = ub if e in ("west", "east") else vb
            tng = vb if e in ("west", "east") else ub
            kw[f"zeta_{e}"] = jnp.asarray(pad_edge(z))
            kw[f"ubar_{e}"] = jnp.asarray(pad_edge(
                nrm if e in ("west", "east") else tng))
            kw[f"vbar_{e}"] = jnp.asarray(pad_edge(
                tng if e in ("west", "east") else nrm))
            kw[f"u_{e}"] = jnp.broadcast_to(
                jnp.asarray(pad_edge(nrm if e in ("west", "east") else tng)),
                (c_cfg.nz, NC + 4))
            kw[f"v_{e}"] = jnp.broadcast_to(
                jnp.asarray(pad_edge(tng if e in ("west", "east") else nrm)),
                (c_cfg.nz, NC + 4))
            kw[f"t_{e}"] = jnp.broadcast_to(
                jnp.asarray(pad_edge(tm))[None], (c_cfg.nt, c_cfg.nz,
                                                  NC + 4))
        return zero_boundary(c_cfg).replace(**kw)

    # ---- child run: OBC bound to parent data + sponge_tune + upscale ---
    c_cfg = c_cfg.replace(upscale_output=True)
    pf_c = init_pflx(c_cfg)
    state_box = {"tun": tun, "pf": pf_c, "net_flux": 0.0,
                 "captured": None}

    def forcing_fn(t, base, st):
        bry = to_boundary(state_box["tun"], bry_at(t))
        return base.replace(bry=bry)

    def hook(s, i):
        # sponge auto-tune from the child's fast flux vs the parent's
        pf_c, up, vp = calc_pflx(state_box["pf"], s, c_grid, c_cfg,
                                 timescale=4 * c_cfg.dt)
        state_box["pf"] = pf_c
        rec = pflx_recs[min(i - 1, len(pflx_recs) - 1)]
        pflx_parent = {e: jnp.asarray(pad_edge(np.abs(rec[e])))
                       for e in rec}
        state_box["tun"] = adjust_orlanski(
            state_box["tun"], up, vp, pflx_parent, c_cfg,
            sp_timscale=20 * c_cfg.dt)
        # integrate the captured outward boundary fluxes (tracer 0)
        up_c = s.upscale
        tot = 0.0
        for e in ("west", "east"):
            tot += float(jnp.sum(up_c[e][0][:, 2:-2]))
        for e in ("south", "north"):
            tot += float(jnp.sum(up_c[e][0][:, 2:-2]))
        state_box["net_flux"] += c_cfg.dt * tot
        state_box["captured"] = up_c

    def content(st):
        da = 1.0 / (np.asarray(c_grid.pm) * np.asarray(c_grid.pn))
        tz = np.asarray(st.t[0], np.float64) * np.asarray(st.hz, np.float64)
        return float((tz * da[None])[:, 2:-2, 2:-2].sum())

    c0 = content(c_st)
    st_end, rows = run(c_grid, c_st, c_frc, c_cfg, nsteps=NSTEPS,
                       forcing_fn=forcing_fn, step_hook=hook)
    c1 = content(st_end)

    # the sponge tuning actually moved the binding velocities
    assert not np.allclose(np.asarray(state_box["tun"].ub_west),
                           c_cfg.ubind)

    # ---- conservation: interior content change == -integrated outward
    # boundary flux (flux-form corrector; vertical solve is column
    # -conservative; no surface fluxes/diffusion in this configuration)
    np.testing.assert_allclose(c1 - c0, -state_box["net_flux"],
                               rtol=5e-9, atol=1e-8 * abs(c0))

    # ---- upscale feedback: re-force the PARENT with the captured fluxes
    # as a dense CDR-style source at the child-footprint boundary cells
    # (reference: Iceland_parent_with_upscaling reads the upscale file as
    # forcing; here mode-3 dense CDR carries it)
    from roms_tpu.cdr import cdr_3d

    up_c = state_box["captured"]
    jyp, ixp = p_cfg.ny + 4, p_cfg.nx + 4
    flx3 = np.zeros((p_cfg.nt, p_cfg.nz, jyp, ixp))
    # child edge cell -> parent cell: 2 child cells per parent cell
    i0 = NP // 4 + 2
    for e, sgn_axis in (("west", 0), ("east", 1)):
        strip = np.asarray(up_c[e][0])[:, 2:-2]      # (nz, NC)
        pc = strip.reshape(p_cfg.nz, NC // 2, 2).sum(axis=2)
        ip = i0 if e == "west" else i0 + NP // 2 - 1
        flx3[0, :, i0:i0 + NP // 2, ip] += pc
    inj = float(flx3.sum())
    p_cfg2 = p_cfg.replace(ntimes=2)
    g2, s2, f2 = obc_basin.setup(p_cfg2)
    f2 = f2.replace(cdr=cdr_3d(p_cfg2, flx3))
    da_p = 1.0 / (np.asarray(g2.pm) * np.asarray(g2.pn))

    def pcontent(st):
        tz = np.asarray(st.t[0], np.float64) * np.asarray(st.hz, np.float64)
        return float((tz * da_p[None]).sum())

    pc0 = pcontent(s2)
    s2b, _ = run(g2, s2, f2, p_cfg2, nsteps=2, collect_diag=False)
    pc1 = pcontent(s2b)
    # the injection raises the parent content by exactly dt*sum(flx)/step
    # (reference: step3d_t_ISO.F:862-881 semantics of CDR mode 3), modulo
    # what the open boundaries let out (hence the loose-ish tolerance)
    expect = 2 * p_cfg2.dt * inj
    assert np.isfinite(pc1)
    if abs(expect) > 0:
        got = pc1 - pc0
        assert abs(got - expect) < 0.2 * abs(expect) + 1e-6 * abs(pc0), (
            got, expect)
