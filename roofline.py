"""Roofline study of the production baroclinic step (dev tool).

For the whole step and each hot component at production bench scale
(384x192x60, nt=34, f32 — bench.py's headline config) this measures:

  * wall ms/call on the attached accelerator,
  * XLA's own "bytes accessed" from compiled cost_analysis(),
  * a HAND-COUNTED minimal-traffic model (each input field read once +
    each output written once at f32 — the speed-of-light floor), and
  * achieved GB/s against the chip's HBM peak.

Output: a markdown table (paste into ROOFLINE.md) + one JSON line.

HBM peak: TPU v5e (v5 lite) = 819 GB/s per chip (public spec,
jax-ml.github.io/scaling-book hardware table).  The dynamical core is a
short-stencil f32 code — every kernel here is expected to sit on the
bandwidth roof, not the FLOP roof.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_roms_tpu")

HBM_PEAK_GBS = 819.0   # v5e; override with --peak


def _bytes_accessed(compiled):
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("bytes accessed", float("nan")))
    except Exception:
        return float("nan")


def timeit(fn, *args, n=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def field_bytes(cfg, nfields3d=1.0, nfields2d=0.0, nt_fields=0.0, dtype=4):
    """Bytes for reading/writing whole fields once: 3D (nz), 2D, tracer(nt,nz)."""
    jy, ix = cfg.ny + 4 + cfg.pad_n, cfg.nx + 4 + cfg.pad_e
    p3 = cfg.nz * jy * ix * dtype
    p2 = jy * ix * dtype
    return nfields3d * p3 + nfields2d * p2 + nt_fields * cfg.nt * p3


def main():
    from roms_tpu.cases import bench_production
    from roms_tpu.ops import advection as adv
    from roms_tpu.ops import barotropic, eos, kinematics, kpp, vmix
    from roms_tpu.ops import prsgrd as prsgrd_mod
    from roms_tpu.ops.weights import set_weights
    from roms_tpu.parallel.halo import make_halo_fill
    from roms_tpu.stepper import step

    dtype = jnp.float32
    cfg = bench_production.config(nx=384, ny=192, nz=60, nt=34)
    grid, st, forcing = bench_production.setup(cfg, dtype=dtype)
    w1, w2, _ = set_weights(cfg.ndtfast)
    w1 = jnp.asarray(w1, dtype)
    w2 = jnp.asarray(w2, dtype)
    halo = make_halo_fill(cfg)
    pmn = grid.pm * grid.pn

    rows = []

    def probe(name, fn, *args, min_bytes=None, n=20):
        try:
            jitted = jax.jit(fn)
            lowered = jitted.lower(*args)
            compiled = lowered.compile()
            xla_bytes = _bytes_accessed(compiled)
            ms = timeit(jitted, *args, n=n)
        except Exception as exc:
            print(f"{name:22s} FAILED: {type(exc).__name__}: "
                  f"{str(exc)[:200]}", flush=True)
            rows.append({"kernel": name, "ms": float("nan"),
                         "error": str(exc)[:200]})
            return None
        gbs = xla_bytes / ms / 1e6 if np.isfinite(xla_bytes) else float("nan")
        sol_ms = (min_bytes / HBM_PEAK_GBS / 1e6) if min_bytes else float("nan")
        rows.append({
            "kernel": name, "ms": ms, "xla_bytes": xla_bytes,
            "achieved_GBs": gbs, "min_bytes": min_bytes,
            "sol_ms": sol_ms,
            "pct_sol": 100.0 * sol_ms / ms if min_bytes else float("nan"),
        })
        import sys
        sys.stdout.flush()
        print(f"{name:22s} {ms:8.2f} ms  xla={xla_bytes/1e9 if np.isfinite(xla_bytes) else -1:7.2f} GB "
              f"-> {gbs:6.0f} GB/s   min={min_bytes/1e9 if min_bytes else 0:6.2f} GB  "
              f"SoL={sol_ms:6.2f} ms  ({rows[-1]['pct_sol']:5.1f}% of SoL)")
        return compiled

    # ---- full step (both tracer-engine paths) ----------------------------
    import roms_tpu.stepper as stepper_mod
    from roms_tpu.ops import pallas_tracer
    from roms_tpu.stepper import step_impl

    st1 = step(st, forcing, grid, w1, w2, cfg, first_step=True)
    jax.block_until_ready(st1.zeta)

    # minimal per-step traffic model (hand count, f32):
    #   tracer engine: read t(n), t_half write+read, t(n+1) write  -> pred:
    #     read t+t_prev+hz+we+wi+akt, write t_half        (~4 nt-fields R, 1 W)
    #     corr: read t_half, t, hz, we, wi, akt, write t  (~4 R, 1 W)
    #   -> dominated by ~10 nt-sized field passes
    #   momentum/EOS/KPP/fast loop: ~45 3D-field passes + 2D small change
    min_step = field_bytes(cfg, nfields3d=45.0, nt_fields=10.0)
    for use_pallas in (False, True):
        jax.clear_caches()
        stepper_mod._use_pallas_tracer = (
            lambda c, s, h, _u=use_pallas: _u and pallas_tracer.usable(c))
        name = "FULL STEP (pallas)" if use_pallas else "FULL STEP (jnp)"
        probe(name,
              lambda s: step_impl(s, forcing, grid, w1, w2, cfg, False, halo),
              st1, min_bytes=min_step, n=10)

    # fused Pallas tracer stage at full production batch
    pmn_f = grid.pm * grid.pn
    probe("pallas_tracer_stage",
          lambda t: pallas_tracer.tracer_stage(
              t, t, st1.flx_u, st1.flx_v, st1.hz, st1.hz, st1.we, st1.wi,
              st1.akt, pmn_f, grid.rmask, grid.umask, grid.vmask, cfg,
              cfg.ts_corr_scheme, cfg.dt, 0.0, 1.0, True, "corr"),
          st1.t,
          # tk double view + pad copy + t_sec + out + shared 3D fields
          min_bytes=field_bytes(cfg, nfields3d=10, nt_fields=3))

    # ---- components --------------------------------------------------------
    e = eos.rho_eos(st1.t, st1.z_r, st1.z_w, st1.hz, grid.rmask, cfg,
                    need_bvf=True)

    probe("rho_eos(+bvf)",
          lambda t: eos.rho_eos(t, st1.z_r, st1.z_w, st1.hz, grid.rmask,
                                cfg, need_bvf=True),
          st1.t,
          # reads T,S,z_r,z_w? (z_r + hz), writes rho1,qp1,rho,bvf,rho_s,rho_a
          min_bytes=field_bytes(cfg, nfields3d=3 + 4, nfields2d=2))

    probe("prsgrd",
          lambda r: prsgrd_mod.prsgrd(r, e.rho1, e.qp1, st1.z_r, st1.z_w,
                                      st1.hz, grid, cfg),
          e.rho, min_bytes=field_bytes(cfg, nfields3d=5 + 2))

    probe("fast_loop(x60)",
          lambda z, u, v: barotropic.fast_loop(
              z, u, v, jnp.zeros_like(u), jnp.zeros_like(v),
              e.rho_s, e.rho_a, forcing,
              st1.du_avg1, st1.dv_avg1, st1.du_avg2, st1.dv_avg2,
              w1, w2, grid, cfg, halo),
          st1.zeta, st1.ubar, st1.vbar,
          # ~nfast(=60) iterations x ~12 2D fields r/w
          min_bytes=field_bytes(cfg, nfields2d=12 * int(cfg.ndtfast * 1.5)))

    # tracer engine at full batch
    akt_b = vmix.gather_akt(st1.akt, cfg)

    probe("t_hadv_flux(nt)",
          lambda t: adv.horiz_tracer_flux(t, st1.flx_u, st1.flx_v, grid,
                                          cfg, cfg.ts_corr_scheme),
          st1.t,
          min_bytes=field_bytes(cfg, nfields3d=2, nt_fields=3))

    probe("t_vadv_spline(nt)",
          lambda t: jax.vmap(adv.vert_tracer_flux_spline,
                             in_axes=(0, None, None))(t, st1.hz, st1.we),
          st1.t,
          min_bytes=field_bytes(cfg, nfields3d=2, nt_fields=2))

    probe("t_implicit(nt)",
          lambda tr: vmix.tracer_implicit_all(tr, st1.hz, akt_b, st1.wi,
                                              pmn, cfg.dt, grid.rmask, cfg,
                                              apply_mask=True),
          st1.t * st1.hz[None],
          min_bytes=field_bytes(cfg, nfields3d=3, nt_fields=3))

    probe("kpp(full)",
          lambda u, v, t: kpp.lmd_kpp(
              u, v, t, e.bvf, st1.z_r, st1.z_w, st1.hz,
              *kpp.interior_mix(u, v, e.bvf, st1.z_r, st1.z_w, grid, cfg),
              st1.swrf, forcing, st1.hbls, st1.hbbl, grid, cfg, False),
          st1.u, st1.v, st1.t,
          min_bytes=field_bytes(cfg, nfields3d=10, nfields2d=6))

    probe("uv_adv_rhs",
          lambda u, v: adv.horiz_uv_adv_rhs(u, v, st1.flx_u, st1.flx_v,
                                            grid, cfg, cfg.uv_corr_scheme),
          st1.u, st1.v, min_bytes=field_bytes(cfg, nfields3d=6))

    probe("omega",
          lambda fu, fv: kinematics.omega(fu, fv, st1.z_w, st1.hz,
                                          forcing.swflx, grid, cfg.dt, cfg,
                                          forcing),
          st1.flx_u, st1.flx_v, min_bytes=field_bytes(cfg, nfields3d=6))

    # ---- the pieces the first pass missed (momentum solves, vertical
    # coordinate, BC/halo overhead) ---------------------------------------
    from roms_tpu import vcoord
    from roms_tpu.ops import bc
    from roms_tpu.parallel.halo import shift

    dc0_u = cfg.dt * 0.25 * (grid.pm + shift(grid.pm, 0, -1)) * (
        grid.pn + shift(grid.pn, 0, -1))
    hzu = 0.5 * (st1.hz + shift(st1.hz, 0, -1))
    akv_u = 0.5 * (st1.akv + shift(st1.akv, 0, -1))
    wi_u = 0.5 * (st1.wi + shift(st1.wi, 0, -1))
    probe("momentum_implicit(u)",
          lambda u: vmix.momentum_implicit(
              hzu * u, hzu, akv_u, wi_u, dc0_u, cfg.dt, forcing.sustr, cfg,
              bottom_drag_coeff=jnp.zeros_like(dc0_u)),
          st1.u, min_bytes=field_bytes(cfg, nfields3d=5))

    probe("set_depth",
          lambda z: vcoord.set_depth(grid.h, z, cfg),
          st1.zeta, min_bytes=field_bytes(cfg, nfields3d=3, nfields2d=2))

    probe("t3dbc+halo(nt)",
          lambda t: halo(bc.t3dbc(t, st1.t, st1.u, st1.v, grid, cfg,
                                  forcing.bry)),
          st1.t, min_bytes=field_bytes(cfg, nt_fields=2))

    probe("halo_group(u,v,t)",
          lambda u, v, t: __import__("roms_tpu.parallel.halo",
                                     fromlist=["halo_group"]).halo_group(
              halo, u, v, t),
          st1.u, st1.v, st1.t,
          min_bytes=field_bytes(cfg, nfields3d=4, nt_fields=2))

    # ---- summary -----------------------------------------------------------
    comp_ms = sum(r["ms"] for r in rows[1:])
    # tracer engine runs twice per step (pred+corr); correct the estimate
    print(f"\ncomponent sum (1x each): {comp_ms:.1f} ms; "
          f"full step: {rows[0]['ms']:.1f} ms")
    print(json.dumps({"rows": rows, "hbm_peak_GBs": HBM_PEAK_GBS}))


if __name__ == "__main__":
    main()
