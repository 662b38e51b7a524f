import time, jax, jax.numpy as jnp
import roms_tpu.stepper as stepper_mod
from roms_tpu.ops import pallas_tracer
from roms_tpu.cases import bench_production
from roms_tpu.ops.weights import set_weights
from roms_tpu.parallel.halo import make_halo_fill

cfg = bench_production.config(nx=384, ny=192, nz=60, nt=34)
grid, st, frc = bench_production.setup(cfg, dtype=jnp.float32)
w1, w2, _ = set_weights(cfg.ndtfast)
w1 = jnp.asarray(w1, jnp.float32); w2 = jnp.asarray(w2, jnp.float32)
halo = make_halo_fill(cfg)
stepper_mod._use_pallas_tracer = (lambda c,s,h: True)
step = jax.jit(lambda s: stepper_mod.step_impl(s, frc, grid, w1, w2, cfg, False, halo))
s = step(st); s = step(s); jax.block_until_ready(s.zeta)
t0 = time.perf_counter()
for _ in range(10): s = step(s)
jax.block_until_ready(s.zeta)
dt = (time.perf_counter()-t0)/10
print(f"pallas step: {dt*1e3:.1f} ms -> {cfg.nx*cfg.ny*cfg.nz/dt:.3e} gp-steps/s")
pmn = grid.pm*grid.pn
stage = jax.jit(lambda t: pallas_tracer.tracer_stage(t, t, s.flx_u, s.flx_v, s.hz, s.hz, s.we, s.wi, s.akt, pmn, grid.rmask, grid.umask, grid.vmask, cfg, cfg.ts_corr_scheme, cfg.dt, 0.0, 1.0, True, "corr"))
o = stage(s.t); jax.block_until_ready(o)
t0 = time.perf_counter()
for _ in range(10): o = stage(s.t)
jax.block_until_ready(o)
print(f"stage alone: {(time.perf_counter()-t0)/10*1e3:.1f} ms")
