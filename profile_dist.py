"""Distributed-step exchange-cost profile (dev tool).

Measures the halo-exchange share of the distributed baroclinic step on the
8-virtual-device CPU mesh (SURVEY §7 hard part (a): the barotropic fast
loop performs one fused 2D exchange per sub-step).  Method: step time is
linear in nfast, so timing two ndtfast values for a normal build and a
build whose exchanges are identity separates

  * per-sub-step cost (slope) into compute vs exchange parts,
  * the nfast-independent remainder (intercept: 3D kernels + ~10 3D
    exchanges).

Caveat recorded with the results: CPU ppermute is a memcpy — it measures
message VOLUME handling, not ICI latency; on real multi-chip hardware the
latency term is larger, which strengthens (not weakens) the case for any
exchange reduction that helps here.

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
       python profile_dist.py
"""

import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_roms_tpu")


class NoopExchange:
    """Identity stand-in for HaloExchange (wrong physics, right cost)."""

    def __call__(self, a):
        return a


def build_step(cfg, mesh, noop: bool):
    from functools import partial

    from jax.sharding import PartitionSpec as P
    from roms_tpu.parallel.dist import _with_ownership, specs_like
    from roms_tpu.parallel.halo import HaloExchange
    from roms_tpu.stepper import step_impl

    py, px = mesh.devices.shape
    ex = NoopExchange() if noop else HaloExchange(
        h=cfg.halo, ew_periodic=cfg.ew_periodic, ns_periodic=cfg.ns_periodic)

    def local_step(state, forcing, grid, w1, w2):
        grid = _with_ownership(grid, cfg, py, px)
        return step_impl(state, forcing, grid, w1, w2, cfg, False, ex)

    def wrapped(state, forcing, grid, w1, w2):
        in_specs = (specs_like(state), specs_like(forcing),
                    specs_like(grid), P(), P())
        return jax.shard_map(local_step, mesh=mesh, in_specs=in_specs,
                             out_specs=specs_like(state))(
            state, forcing, grid, w1, w2)

    return jax.jit(wrapped)


def time_step(fn, st_b, frc_b, grid_b, w1, w2, n=20, reps=3):
    out = fn(st_b, frc_b, grid_b, w1, w2)
    jax.block_until_ready(out.zeta)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(out, frc_b, grid_b, w1, w2)
        jax.block_until_ready(out.zeta)
        best = min(best, (time.perf_counter() - t0) / n)
    return best


def main():
    from roms_tpu.cases import filament
    from roms_tpu.ops.weights import set_weights
    from roms_tpu.parallel.dist import make_mesh, to_blocked

    mesh = make_mesh(8)
    results = {}
    for ndtfast in (20, 60):
        cfg = filament.config().replace(nx=256, ny=128, nz=32,
                                        ndtfast=ndtfast)
        grid, st, frc = filament.setup(cfg, dtype=jnp.float32)
        w1, w2, _ = set_weights(cfg.ndtfast)
        w1 = jnp.asarray(w1, jnp.float32)
        w2 = jnp.asarray(w2, jnp.float32)
        st_b = to_blocked(st, mesh, cfg.halo)
        frc_b = to_blocked(frc, mesh, cfg.halo)
        grid_b = to_blocked(grid, mesh, cfg.halo)
        for noop in (False, True):
            fn = build_step(cfg, mesh, noop)
            dt_s = time_step(fn, st_b, frc_b, grid_b, w1, w2)
            results[(ndtfast, noop)] = dt_s
            print(f"ndtfast={ndtfast:3d} exchanges={'off' if noop else 'on '}"
                  f"  step={dt_s * 1e3:8.2f} ms", flush=True)

    def nfast(ndt):
        return int(round(ndt * 1.5)) + 1

    dn = nfast(60) - nfast(20)
    slope_on = (results[(60, False)] - results[(20, False)]) / dn
    slope_off = (results[(60, True)] - results[(20, True)]) / dn
    sub_exch = slope_on - slope_off
    base_exch = ((results[(20, False)] - results[(20, True)])
                 - sub_exch * nfast(20))
    print(f"per-sub-step cost:      {slope_on * 1e6:8.1f} us "
          f"(compute {slope_off * 1e6:.1f} + exchange {sub_exch * 1e6:.1f})")
    print(f"fast-loop exchange fraction of sub-step: "
          f"{sub_exch / slope_on * 100.0:.1f}%")
    print(f"3D-exchange + residual cost per step: {base_exch * 1e3:8.2f} ms")
    tot = results[(60, False)]
    print(f"whole-step exchange fraction (ndtfast=60): "
          f"{(sub_exch * nfast(60) + base_exch) / tot * 100.0:.1f}%")


if __name__ == "__main__":
    main()
