"""Sanitizer tier — the race-detector / debug-build analog (SURVEY §5).

The reference's debugging story is compiler sanitizers + mpi_test; the
JAX-native equivalents are `jax_debug_nans` (every primitive output
checked for NaN/Inf at dispatch — catches masked-garbage leaks the
physics normally hides) and `jax.experimental.checkify` div/NaN checks.
Run in a subprocess: `jax_debug_nans` is process-global and disables
donation/async dispatch, so it must not leak into the other tests."""

import os
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SCRIPT = """
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_debug_nans", True)

import jax.numpy as jnp
from roms_tpu.driver import run
from roms_tpu.cases import filament, obc_basin

# periodic core
cfg = filament.config(ntimes=2).replace(nx=16, ny=16, nz=6)
grid, st, frc = filament.setup(cfg)
st, _ = run(grid, st, frc, cfg, nsteps=2, collect_diag=False)
assert bool(jnp.all(jnp.isfinite(st.zeta)))

# masked + open boundaries + KPP: the configuration where land-cell or
# ghost-line garbage would first trip the NaN checker
cfg = obc_basin.config("radiating").replace(
    nx=16, ny=16, nz=6, ndtfast=12, lmd_kpp=True, masking=True)
grid, st, frc = obc_basin.setup(cfg, land_blob=True)
st, _ = run(grid, st, frc, cfg, nsteps=2, collect_diag=False)
assert bool(jnp.all(jnp.isfinite(st.zeta)))
print("DEBUG_NANS_OK")
"""


def test_step_clean_under_debug_nans():
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run([sys.executable, "-c", _SCRIPT], cwd=_REPO,
                          env=env, capture_output=True, text=True,
                          timeout=580)
    assert proc.returncode == 0, (
        f"debug_nans run failed\nstdout:\n{proc.stdout}\n"
        f"stderr:\n{proc.stderr[-3000:]}")
    assert "DEBUG_NANS_OK" in proc.stdout
