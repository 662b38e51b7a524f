"""Benchmark: grid-points/s/chip for the full baroclinic step.

Runs a production-scale analytic (Filament-type) configuration in float32 on
the available accelerator and prints ONE JSON line.

Baseline note: the reference publishes no optimized throughput numbers.  The
only recorded timing is the CI test build (-O0, gfortran, 6 MPI ranks):
Filament 64x64x32, 20 steps in 7.12 s wall → 3.68e5 grid-point-steps/s
(reference: tests/Filament/benchmark.result_github_gnu:173).  vs_baseline is
measured against that anchor; see BASELINE.md for the optimized-anchor
protocol.
"""

import json
import sys
import time

REF_CI_POINTS_PER_S = 64 * 64 * 32 * 20 / 7.12


def main():
    import jax
    import jax.numpy as jnp

    from roms_tpu.cases import filament
    from roms_tpu.driver import run  # noqa: F401  (import check)
    from roms_tpu.ops.weights import set_weights
    from roms_tpu.stepper import step

    # production-like scale (reference default config is 920x480x60,
    # reference: src/param.opt:18-21, on 128 ranks; one chip gets this)
    nx, ny, nz = 512, 256, 60
    dtype = jnp.float32
    cfg = filament.config().replace(nx=nx, ny=ny, nz=nz)
    grid, state, forcing = filament.setup(cfg, dtype=dtype)
    w1, w2, _ = set_weights(cfg.ndtfast)
    w1 = jnp.asarray(w1, dtype)
    w2 = jnp.asarray(w2, dtype)

    # warmup / compile (first_step variant once, then the steady variant)
    state = step(state, forcing, grid, w1, w2, cfg, first_step=True)
    state = step(state, forcing, grid, w1, w2, cfg, first_step=False)
    jax.block_until_ready(state.zeta)

    nsteps = 10
    t0 = time.perf_counter()
    for _ in range(nsteps):
        state = step(state, forcing, grid, w1, w2, cfg, first_step=False)
    jax.block_until_ready(state.zeta)
    dt_wall = time.perf_counter() - t0
    assert bool(jnp.all(jnp.isfinite(state.zeta))), "benchmark state blew up"

    pts_per_s = nx * ny * nz * nsteps / dt_wall
    print(json.dumps({
        "metric": "gridpoints_per_s_per_chip_full_baroclinic_step",
        "value": pts_per_s,
        "unit": "gridpoint-steps/s",
        "vs_baseline": pts_per_s / REF_CI_POINTS_PER_S,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
