"""Standalone timing of the fused Pallas tracer stage (dev tool)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_roms_tpu")

from roms_tpu.cases import bench_production
from roms_tpu.ops import pallas_tracer


def main():
    nx, ny, nz, nt = 384, 192, 60, 34
    cfg = bench_production.config(nx=nx, ny=ny, nz=nz, nt=nt)
    grid, st, forcing = bench_production.setup(cfg, dtype=jnp.float32)

    key = jax.random.PRNGKey(0)
    shape_t = st.t.shape
    tk = jax.random.normal(key, shape_t, jnp.float32) * 0.01 + 10.0
    t_sec = tk * 1.001
    pmn = grid.pm * grid.pn
    mix = {"diff2": jnp.full((cfg.nt,) + grid.h.shape, cfg.tnu2,
                             jnp.float32),
           "pmon_u": grid.pmon_u, "pnom_v": grid.pnom_v}

    def run(mode, use_mix, bj=None):
        if bj is not None:
            pallas_tracer.BJ = bj
        fn = jax.jit(lambda tk, ts: pallas_tracer.tracer_stage(
            tk, ts, st.flx_u, st.flx_v, st.hz, st.hz, st.we, st.wi,
            st.akt, pmn, grid.rmask, grid.umask, grid.vmask, cfg,
            cfg.ts_corr_scheme, cfg.dt, 0.0, 1.0, True, mode,
            stflx=forcing.stflx, mix=(mix if use_mix else None)))
        out = fn(tk, t_sec)
        jax.block_until_ready(out)
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(10):
                out = fn(tk, t_sec)
            jax.block_until_ready(out)
            best = min(best, (time.perf_counter() - t0) / 10 * 1e3)
        return best

    for bj in (8, 16):
        ms = run("corr", True, bj=bj)
        print(f"corr+mix BJ={bj:2d}: {ms:7.2f} ms")
    pallas_tracer.BJ = 8
    print(f"corr      BJ= 8: {run('corr', False):7.2f} ms")
    print(f"pred      BJ= 8: {run('pred', False):7.2f} ms")


if __name__ == "__main__":
    main()
