"""A/B step timing for halo-fill / BC implementation variants (dev tool)."""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_roms_tpu")

from roms_tpu.cases import bench_production
from roms_tpu.ops.weights import set_weights
from roms_tpu import stepper
from roms_tpu.parallel import halo as halo_mod


def scatter_fill(a, h=2, ew_periodic=True, ns_periodic=True):
    """Round-4 scatter form of mixed_fill (A side)."""
    if ew_periodic:
        a = a.at[..., :, :h].set(a[..., :, -2 * h:-h])
        a = a.at[..., :, -h:].set(a[..., :, h:2 * h])
    else:
        a = a.at[..., :, :h - 1].set(a[..., :, h - 1:h])
        a = a.at[..., :, -(h - 1):].set(a[..., :, -h:-h + 1])
    if ns_periodic:
        a = a.at[..., :h, :].set(a[..., -2 * h:-h, :])
        a = a.at[..., -h:, :].set(a[..., h:2 * h, :])
    else:
        a = a.at[..., :h - 1, :].set(a[..., h - 1:h, :])
        a = a.at[..., -(h - 1):, :].set(a[..., -h:-h + 1, :])
    return a


def timeit(fn, args, n=20):
    out = fn(*args)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / n * 1e3)
    return best


def main():
    cfg = bench_production.config(nx=384, ny=192, nz=60, nt=34)
    grid, st, forcing = bench_production.setup(cfg, dtype=jnp.float32)
    w1, w2, _ = set_weights(cfg.ndtfast)
    w1 = jnp.asarray(w1, jnp.float32)
    w2 = jnp.asarray(w2, jnp.float32)
    st = stepper.step(st, forcing, grid, w1, w2, cfg, first_step=True)

    variants = {
        "A scatter mixed_fill": partial(scatter_fill, h=cfg.halo,
                                        ew_periodic=cfg.ew_periodic,
                                        ns_periodic=cfg.ns_periodic),
        "B select mixed_fill": partial(halo_mod.mixed_fill, h=cfg.halo,
                                       ew_periodic=cfg.ew_periodic,
                                       ns_periodic=cfg.ns_periodic),
    }
    for name, halo_fn in variants.items():
        fn = jax.jit(partial(stepper.step_impl, cfg=cfg, first_step=False,
                             halo=halo_fn))
        ms = timeit(fn, (st, forcing, grid, w1, w2))
        print(f"{name:24s} {ms:8.2f} ms")


if __name__ == "__main__":
    main()
