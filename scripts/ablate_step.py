"""Ablation timing of the production step (dev tool; SURVEY.md §6).

Times the full bench_production step on the attached accelerator with
individual components replaced by identity/trivial stubs at trace time,
so each row reports the wall-clock that component contributes INSIDE the
fused program (standalone kernel timings overstate costs that XLA would
have fused; ablation measures the true marginal).

Usage: python scripts/ablate_step.py [nx ny nz nt]
"""

import os
import sys
import time
from contextlib import contextmanager
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_roms_tpu")

from roms_tpu.cases import bench_production
from roms_tpu.ops.weights import set_weights
from roms_tpu.parallel.halo import make_halo_fill


@contextmanager
def patched(*entries):
    """entries: (module, attrname, replacement)."""
    saved = [(m, n, getattr(m, n)) for m, n, _ in entries]
    try:
        for m, n, r in entries:
            setattr(m, n, r)
        yield
    finally:
        for m, n, v in saved:
            setattr(m, n, v)


def timeit(fn, args, n=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    nx, ny, nz, nt = 384, 192, 60, 34
    if len(sys.argv) > 1:
        nx, ny, nz, nt = map(int, sys.argv[1:5])
    dtype = jnp.float32

    from roms_tpu import stepper
    from roms_tpu.ops import barotropic, bc, pallas_kpp, pallas_solve, \
        pallas_tracer, prsgrd, vmix
    from roms_tpu.ops.kpp import VmixOut

    cfg = bench_production.config(nx=nx, ny=ny, nz=nz, nt=nt)
    grid, st, forcing = bench_production.setup(cfg, dtype=dtype)
    w1, w2, _ = set_weights(cfg.ndtfast)
    w1 = jnp.asarray(w1, dtype)
    w2 = jnp.asarray(w2, dtype)
    halo = make_halo_fill(cfg)

    def run_variant(name, entries, halo_fn=halo):
        fn = jax.jit(partial(stepper.step_impl, cfg=cfg, first_step=False,
                             halo=halo_fn))
        with patched(*entries):
            ms = timeit(fn, (st, forcing, grid, w1, w2))
        print(f"{name:28s} {ms:8.2f} ms")
        return ms

    # warm state: one first step
    st = stepper.step(st, forcing, grid, w1, w2, cfg, first_step=True)

    base = run_variant("full step", [])

    # ---- ablations ------------------------------------------------------
    def no_tracer_stage(tk, t_sec, *a, **k):
        return t_sec

    run_variant("- tracer stages (x2)",
                [(pallas_tracer, "tracer_stage", no_tracer_stage)])

    def no_kpp(state, u, v, t, bvf, z_r, z_w, hz, forcing, grid, cfg,
               first_step):
        return VmixOut(akv=state.akv, akt=state.akt, hbls=state.hbls,
                       hbbl=state.hbbl,
                       ghat=jnp.zeros_like(state.akv))

    run_variant("- kpp vmix (x2)",
                [(pallas_kpp, "vmix_update", no_kpp)])

    run_variant("- t3dbc (x2)",
                [(bc, "t3dbc", lambda t_new, *a, **k: t_new)])

    run_variant("- u3dbc/v3dbc",
                [(bc, "u3dbc", lambda u_new, *a, **k: u_new),
                 (bc, "v3dbc", lambda v_new, *a, **k: v_new)])

    def no_fast_loop(zeta0, ubar0, vbar0, rufrc, rvfrc, rho_s, rho_a,
                     forcing, du_avg1_in, dv_avg1_in, du_avg2_in,
                     dv_avg2_in, w1, w2, grid, cfg, halo_fill):
        return dict(zeta=zeta0, ubar=ubar0, vbar=vbar0,
                    du_avg1=du_avg1_in, dv_avg1=dv_avg1_in,
                    du_avg2=du_avg2_in, dv_avg2=dv_avg2_in,
                    du_avg_bak=du_avg1_in, dv_avg_bak=dv_avg1_in,
                    rufrc=rufrc, rvfrc=rvfrc)

    run_variant("- fast loop",
                [(barotropic, "fast_loop", no_fast_loop)])

    def no_mom_solve(rhs, hz_face, akv_face, wi_face, dc0, dtau, sstr, cfg,
                     bottom_drag_coeff=None):
        return rhs / jnp.maximum(hz_face, 1e-20)

    run_variant("- momentum implicit (x4)",
                [(pallas_solve, "momentum_implicit", no_mom_solve)])

    run_variant("- prsgrd",
                [(prsgrd, "prsgrd",
                  lambda rho, rho1, qp1, z_r, z_w, hz, grid, cfg, ptide=None:
                  (jnp.zeros_like(hz), jnp.zeros_like(hz)))])

    run_variant("- halo fills", [], halo_fn=lambda a: a)

    def no_trc_implicit(t_rhs, hz, akt_b, wi, pmn, dtau, rmask, cfg,
                        apply_mask=True):
        return t_rhs / jnp.maximum(hz, 1e-20)

    run_variant("- tracer impl (in-stage off)",
                [(pallas_tracer, "tracer_stage", no_tracer_stage),
                 (vmix, "tracer_implicit_all", no_trc_implicit)])

    print(f"{'(baseline for deltas)':28s} {base:8.2f} ms")


if __name__ == "__main__":
    main()
