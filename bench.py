"""Benchmark: grid-points/s/chip for the full baroclinic step.

Prints ONE JSON line.  The headline metric is the PRODUCTION-physics
configuration (nonlinear split EOS + KPP + T,S + 32 passive tracers +
land masking + 4-side open boundaries — the cost profile of the
reference's realistic cases, reference: tests/CDR_*/cppdefs.opt,
src/param.opt:18-32); the light Filament-type number (split-explicit
core only, the round-1/2 metric) is carried in the same line for
continuity.

Baseline: the reference publishes no optimized throughput numbers, and
this image has no Fortran compiler (no gfortran/mpif90/flang), so the
BASELINE.md `-O3` anchor cannot be measured here.  vs_baseline therefore
uses a *conservative estimated* `-O3` anchor: the measured CI `-O0`
timing (Filament 64x64x32, 20 steps in 7.12 s on 6 ranks ->
3.68e5 gridpoint-steps/s, reference:
tests/Filament/benchmark.result_github_gnu:173) scaled by 10x — above
the 2-5x range typical of -O0->-O3 on stencil Fortran, i.e. biased
AGAINST this framework.  Both anchors and the full derivation are in
BASELINE.md.
"""

import json
import sys
import time

REF_CI_O0_PTS_PER_S = 64 * 64 * 32 * 20 / 7.12   # measured (reference CI)
O3_OVER_O0_ESTIMATE = 10.0                        # conservative (see above)
REF_EST_O3_PTS_PER_S = REF_CI_O0_PTS_PER_S * O3_OVER_O0_ESTIMATE


def _time_config(cfg, grid, state, forcing, nsteps=10):
    import jax
    import jax.numpy as jnp

    from roms_tpu.ops.weights import set_weights
    from roms_tpu.stepper import step

    dtype = state.zeta.dtype
    w1, w2, _ = set_weights(cfg.ndtfast)
    w1 = jnp.asarray(w1, dtype)
    w2 = jnp.asarray(w2, dtype)

    # warmup / compile (first_step variant once, then the steady variant)
    state = step(state, forcing, grid, w1, w2, cfg, first_step=True)
    state = step(state, forcing, grid, w1, w2, cfg, first_step=False)
    jax.block_until_ready(state.zeta)

    t0 = time.perf_counter()
    for _ in range(nsteps):
        state = step(state, forcing, grid, w1, w2, cfg, first_step=False)
    jax.block_until_ready(state.zeta)
    dt_wall = time.perf_counter() - t0
    assert bool(jnp.all(jnp.isfinite(state.zeta))), "benchmark state blew up"
    return cfg.nx * cfg.ny * cfg.nz * nsteps / dt_wall


def main():
    import jax.numpy as jnp

    from roms_tpu.cases import bench_production, filament

    # production physics (the headline); 384x192x60 x 34 tracers fits the
    # single v5e chip's 16 GB HBM (512x256 x nt=34 x ~10 live t-sized
    # buffers exhausts it)
    cfg_p = bench_production.config(nx=384, ny=192, nz=60, nt=34)
    grid, st, frc = bench_production.setup(cfg_p, dtype=jnp.float32)
    pts_prod = _time_config(cfg_p, grid, st, frc)

    # light split-explicit core (round-1/2 continuity metric)
    nx, ny, nz = 512, 256, 60
    cfg_l = filament.config().replace(nx=nx, ny=ny, nz=nz)
    grid, st, frc = filament.setup(cfg_l, dtype=jnp.float32)
    pts_light = _time_config(cfg_l, grid, st, frc)

    print(json.dumps({
        "metric": "gridpoints_per_s_per_chip_production_physics_step",
        "value": pts_prod,
        "unit": "gridpoint-steps/s",
        "vs_baseline": pts_prod / REF_EST_O3_PTS_PER_S,
        "light_physics_value": pts_light,
        "light_vs_est_O3": pts_light / REF_EST_O3_PTS_PER_S,
        "baseline_anchor": "estimated -O3 = 10x measured CI -O0 "
                           "(see BASELINE.md; no Fortran toolchain in image)",
        "anchor_note": "the anchor is Filament (light) physics, so "
                       "vs_baseline UNDERSTATES the production-step ratio "
                       "(~20x more work per gridpoint than the anchor's "
                       "config); light_vs_est_O3 is the like-for-like "
                       "comparison",
        "config": {"nx_production": cfg_p.nx, "ny_production": cfg_p.ny,
                   "nx_light": nx, "ny_light": ny, "nz": nz,
                   "nt_production": 34,
                   "dtype": "float32",
                   "production_physics": "nonlin split EOS + KPP + salinity"
                                         " + 32 passive tracers + masking"
                                         " + 4-side OBC"},
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
