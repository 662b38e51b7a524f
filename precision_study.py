"""f32-vs-f64 trajectory divergence study (SURVEY §7(e); results in
PRECISION.md).

Steps Filament (periodic split-explicit core) and Rivers_ana (masked, KPP,
nonlinear EOS, point sources) in float32 and float64 side by side and logs
the max relative drift of zeta/u/temp every 10 steps, plus the diagnosed
energies.  The f64 trajectory is the truth (the reference is f64
throughout, set_global_definitions.h:128-134).

Run: JAX_PLATFORMS=cpu python precision_study.py [nsteps]
"""

import json
import sys

import numpy as np


def drift(a64, a32):
    a = np.asarray(a64, np.float64)[..., 2:-2, 2:-2]
    b = np.asarray(a32, np.float64)[..., 2:-2, 2:-2]
    scale = np.abs(a).max() or 1.0
    return float(np.abs(a - b).max() / scale)


def study(name, make, nsteps):
    import jax
    import jax.numpy as jnp
    from roms_tpu.ops.weights import set_weights
    from roms_tpu.stepper import step
    from roms_tpu.diag import compute_diag

    rows = []
    states = {}
    for dtype in (jnp.float64, jnp.float32):
        cfg, grid, st, frc = make(dtype)
        w1, w2, _ = set_weights(cfg.ndtfast)
        w1 = jnp.asarray(w1, dtype)
        w2 = jnp.asarray(w2, dtype)
        states[dtype.__name__] = (cfg, grid, st, frc, w1, w2)

    c64, g64, s64, f64_, w164, w264 = states["float64"]
    c32, g32, s32, f32_, w132, w232 = states["float32"]
    from roms_tpu.stepper import step as _step
    for i in range(nsteps):
        s64 = _step(s64, f64_, g64, w164, w264, c64, first_step=(i == 0))
        s32 = _step(s32, f32_, g32, w132, w232, c32, first_step=(i == 0))
        if (i + 1) % 10 == 0 or i == 0:
            d64 = compute_diag(s64, g64, c64)
            d32 = compute_diag(s32, g32, c32)
            ke64 = float(d64.avke)
            ke32 = float(d32.avke)
            rows.append({
                "step": i + 1,
                "zeta": drift(s64.zeta, s32.zeta),
                "u": drift(s64.u, s32.u),
                "temp": drift(s64.t[0], s32.t[0]),
                "ke_rel": abs(ke32 - ke64) / max(abs(ke64), 1e-300),
            })
            print(f"{name} step {i+1:4d}: zeta {rows[-1]['zeta']:.3e}  "
                  f"u {rows[-1]['u']:.3e}  temp {rows[-1]['temp']:.3e}  "
                  f"KE rel {rows[-1]['ke_rel']:.3e}", flush=True)
    return rows


def main():
    import jax
    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_roms_tpu")
    nsteps = int(sys.argv[1]) if len(sys.argv) > 1 else 200

    def make_filament(dtype):
        from roms_tpu.cases import filament
        cfg = filament.config()
        grid, st, frc = filament.setup(cfg, dtype=dtype)
        return cfg, grid, st, frc

    def make_rivers(dtype):
        from roms_tpu.cases import rivers_ana
        cfg = rivers_ana.config()
        grid, st, frc = rivers_ana.setup(cfg, dtype=dtype)
        return cfg, grid, st, frc

    out = {"filament": study("filament", make_filament, nsteps),
           "rivers_ana": study("rivers_ana", make_rivers, nsteps)}
    with open("PRECISION_DATA.json", "w") as f:
        json.dump(out, f, indent=1)
    print("wrote PRECISION_DATA.json")


if __name__ == "__main__":
    main()
