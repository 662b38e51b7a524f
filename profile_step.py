"""Component-level timing of the baroclinic step at bench scale (dev tool).

Prints per-component ms per call on the available accelerator, to target
optimization work (SURVEY.md §6 step-time breakdown protocol).
"""

import time

import jax
import jax.numpy as jnp

from roms_tpu.cases import filament
from roms_tpu.ops import barotropic, eos, kinematics, vmix
from roms_tpu.ops import prsgrd as prsgrd_mod
from roms_tpu.ops import advection as adv
from roms_tpu.ops.weights import set_weights
from roms_tpu.parallel.halo import make_halo_fill
from roms_tpu.stepper import step

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_roms_tpu")


def timeit(fn, *args, n=10, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    nx, ny, nz = 512, 256, 60
    dtype = jnp.float32
    cfg = filament.config().replace(nx=nx, ny=ny, nz=nz)
    grid, st, forcing = filament.setup(cfg, dtype=dtype)
    w1, w2, _ = set_weights(cfg.ndtfast)
    w1 = jnp.asarray(w1, dtype)
    w2 = jnp.asarray(w2, dtype)
    halo = make_halo_fill(cfg)
    pmn = grid.pm * grid.pn

    st = step(st, forcing, grid, w1, w2, cfg, first_step=True)
    print(f"full step: {timeit(step, st, forcing, grid, w1, w2, cfg, False):8.2f} ms")

    f_eos = jax.jit(lambda t: eos.rho_eos(t, st.z_r, st.z_w, st.hz,
                                          grid.rmask, cfg))
    print(f"rho_eos  : {timeit(f_eos, st.t):8.2f} ms")

    e = eos.rho_eos(st.t, st.z_r, st.z_w, st.hz, grid.rmask, cfg)
    f_pgr = jax.jit(lambda r: prsgrd_mod.prsgrd(r, e.rho1, e.qp1, st.z_r,
                                                st.z_w, st.hz, grid, cfg))
    print(f"prsgrd   : {timeit(f_pgr, e.rho):8.2f} ms")

    f_fast = jax.jit(lambda z, u, v: barotropic.fast_loop(
        z, u, v, jnp.zeros_like(u), jnp.zeros_like(v),
        e.rho_s, e.rho_a, forcing,
        st.du_avg1, st.dv_avg1, st.du_avg2, st.dv_avg2,
        w1, w2, grid, cfg, halo))
    print(f"fast_loop: {timeit(f_fast, st.zeta, st.ubar, st.vbar):8.2f} ms")

    f_timp = jax.jit(lambda t: vmix.tracer_implicit(
        t * st.hz, st.hz, st.akt[0], st.wi, pmn, cfg.dt, grid.rmask, cfg,
        apply_mask=True))
    print(f"t_implct : {timeit(f_timp, st.t[0]):8.2f} ms  (x{cfg.nt} tracers x2 stages)")

    f_adv = jax.jit(lambda t: adv.horiz_tracer_flux(
        t, st.flx_u, st.flx_v, grid, cfg, cfg.ts_corr_scheme))
    print(f"t_hadv   : {timeit(f_adv, st.t[0]):8.2f} ms")

    f_vadv = jax.jit(lambda t: adv.vert_tracer_flux_spline(t, st.hz, st.we))
    print(f"t_vadv   : {timeit(f_vadv, st.t[0]):8.2f} ms")

    f_om = jax.jit(lambda fu, fv: kinematics.omega(
        fu, fv, st.z_w, st.hz, forcing.swflx, grid, cfg.dt, cfg, forcing))
    print(f"omega    : {timeit(f_om, st.flx_u, st.flx_v):8.2f} ms  (x3)")

    f_uvadv = jax.jit(lambda u, v: adv.horiz_uv_adv_rhs(
        u, v, st.flx_u, st.flx_v, cfg, cfg.uv_corr_scheme))
    print(f"uv_hadv  : {timeit(f_uvadv, st.u, st.v):8.2f} ms  (x2)")


if __name__ == "__main__":
    main()
