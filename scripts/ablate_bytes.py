"""Traffic-vs-scheduling attribution for the BC/halo ablation rows.

`scripts/ablate_step.py` measures wall-clock marginals; this companion
asks XLA itself (`compiled.cost_analysis()["bytes accessed"]`) how much
HBM traffic each component adds to the fused step program.  If a row's
wall-clock marginal is explained by its bytes delta at the measured
achievable bandwidth (~265-414 GB/s on this part, ROOFLINE.md), the cost
is traffic (fixable by fusion/aliasing); if bytes barely move, the cost
is scheduling/serialization (fixable only by restructuring the program).

Usage: python scripts/ablate_bytes.py [nx ny nz nt]
"""

import os
import sys
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_roms_tpu")

from roms_tpu.cases import bench_production
from roms_tpu.ops.weights import set_weights
from roms_tpu.parallel.halo import make_halo_fill
from scripts.ablate_step import patched


def bytes_of(fn, args):
    lowered = jax.jit(fn).lower(*args)
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    return cost.get("bytes accessed", float("nan"))


def main():
    nx, ny, nz, nt = 384, 192, 60, 34
    if len(sys.argv) > 1:
        nx, ny, nz, nt = map(int, sys.argv[1:5])
    dtype = jnp.float32

    from roms_tpu import stepper
    from roms_tpu.ops import bc

    cfg = bench_production.config(nx=nx, ny=ny, nz=nz, nt=nt)
    grid, st, forcing = bench_production.setup(cfg, dtype=dtype)
    w1, w2, _ = set_weights(cfg.ndtfast)
    w1 = jnp.asarray(w1, dtype)
    w2 = jnp.asarray(w2, dtype)
    halo = make_halo_fill(cfg)
    st = stepper.step(st, forcing, grid, w1, w2, cfg, first_step=True)

    def measure(name, entries, halo_fn=halo):
        fn = partial(stepper.step_impl, cfg=cfg, first_step=False,
                     halo=halo_fn)
        with patched(*entries):
            gb = bytes_of(fn, (st, forcing, grid, w1, w2)) / 1e9
        print(f"{name:28s} {gb:8.2f} GB")
        return gb

    base = measure("full step", [])
    measure("- t3dbc (x2)",
            [(bc, "t3dbc", lambda t_new, *a, **k: t_new)])
    measure("- u3dbc/v3dbc",
            [(bc, "u3dbc", lambda u_new, *a, **k: u_new),
             (bc, "v3dbc", lambda v_new, *a, **k: v_new)])
    measure("- halo fills", [], halo_fn=lambda a: a)
    print(f"{'(baseline for deltas)':28s} {base:8.2f} GB")


if __name__ == "__main__":
    main()
