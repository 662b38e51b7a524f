"""Weak-scaling curve of the distributed production-shaped step (dev tool).

Fixed per-device block (the weak-scaling protocol of BASELINE.json's
scaling metric), mesh of 1/2/4/8 virtual CPU devices: if the SPMD step +
two-sweep ppermute halo exchange scale, ms/step stays flat as devices
(and total gridpoints) grow.  Physics menu = cases/bench_production
(nonlinear split EOS + KPP + salinity + passive tracers + masking +
4-side OBC) — the same kernels the headline bench times.

Caveat (recorded with the results): CPU ppermute is a memcpy, so this
measures SPMD overhead + message volume, not ICI latency; flatness here
is necessary but not sufficient for pod-scale flatness.

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
       python profile_scaling.py
"""

import json
import os
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
import jax.numpy as jnp

# sitecustomize may pre-import jax with an accelerator platform; force the
# CPU + 8-virtual-device setup the same way tests/conftest.py does
try:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:
    pass

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_roms_tpu")

BLOCK = 32          # per-device interior is BLOCK x BLOCK
NZ, NT = 32, 8
NSTEPS = 5


def main():
    from roms_tpu.cases import bench_production
    from roms_tpu.ops.weights import set_weights
    from roms_tpu.parallel.dist import (make_distributed_step, make_mesh,
                                        to_blocked)

    dtype = jnp.float32
    rows = []
    for nd in (1, 2, 4, 8):
        mesh = make_mesh(nd)
        py, px = mesh.devices.shape
        cfg = bench_production.config(nx=BLOCK * px, ny=BLOCK * py,
                                      nz=NZ, nt=NT).replace(ndtfast=20)
        grid, state, forcing = bench_production.setup(cfg, dtype=dtype)
        w1, w2, _ = set_weights(cfg.ndtfast)
        w1 = jnp.asarray(w1, dtype)
        w2 = jnp.asarray(w2, dtype)
        h = cfg.halo
        sb = to_blocked(state, mesh, h)
        fb = to_blocked(forcing, mesh, h)
        gb = to_blocked(grid, mesh, h)
        step_first, step_rest = make_distributed_step(cfg, mesh)
        sb = step_first(sb, fb, gb, w1, w2)
        sb = step_rest(sb, fb, gb, w1, w2)
        jax.block_until_ready(sb.zeta)
        t0 = time.perf_counter()
        for _ in range(NSTEPS):
            sb = step_rest(sb, fb, gb, w1, w2)
        jax.block_until_ready(sb.zeta)
        ms = (time.perf_counter() - t0) / NSTEPS * 1e3
        pts = cfg.nx * cfg.ny * cfg.nz
        rows.append({"devices": nd, "mesh": [py, px],
                     "global": [cfg.ny, cfg.nx, NZ, NT],
                     "ms_per_step": ms,
                     "gridpoint_steps_per_s": pts / ms * 1e3})
        print(f"devices={nd} mesh={py}x{px} global={cfg.ny}x{cfg.nx}x{NZ} "
              f"nt={NT}: {ms:8.1f} ms/step  "
              f"({pts / ms * 1e3:.3e} gridpoint-steps/s)", flush=True)
    base = rows[0]["ms_per_step"]
    for r in rows:
        # the virtual devices share this host's physical cores, so ideal
        # "weak scaling" here is ms/step growing LINEARLY with device
        # count (n x the work on fixed silicon); efficiency measures the
        # SPMD + halo-exchange overhead on top of that.  Flat ms/step
        # needs real chips.
        r["fixed_silicon_efficiency"] = (base * r["devices"]
                                         / r["ms_per_step"])
    print(json.dumps({"rows": rows, "protocol":
                      f"weak scaling, fixed {BLOCK}x{BLOCK}x{NZ} "
                      f"interior/device, production physics, CPU mesh "
                      f"(virtual devices share the host cores: ideal "
                      f"ms/step is LINEAR in devices here)"}))


if __name__ == "__main__":
    main()
