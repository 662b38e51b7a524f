"""Execute the driver contract (`__graft_entry__.py`) the way the driver does.

Round 4 shipped a broken `dryrun_multichip` (CFL-unstable ndtfast override,
MULTICHIP_r04.json ok:false) because no test executed it and a naive local
check silently ran a trivial 1x1 mesh when the TPU plugin pre-empted
`JAX_PLATFORMS=cpu`.  This test runs the dry run in a fresh subprocess with
the platform forced in the *environment* (before the interpreter starts, so
no plugin can win), and asserts inside the subprocess that the mesh really
is 2x4 — the 1x1 fallback can never silently pass again.
"""

import os
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SCRIPT = """
import jax
# Belt and braces: the env already forces CPU, but on hosts where an
# accelerator plugin is registered by sitecustomize these config updates
# still win as long as no backend has initialized (tests/conftest.py does
# the same).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
assert jax.default_backend() == "cpu", jax.default_backend()
assert jax.device_count() == 8, jax.device_count()

import __graft_entry__
from roms_tpu.parallel.dist import make_mesh

mesh = make_mesh(8)
assert mesh.devices.shape == (2, 4), mesh.devices.shape

__graft_entry__.dryrun_multichip(8)
print("DRYRUN_OK")
"""


@pytest.mark.timeout(600)
def test_dryrun_multichip_8cpu():
    env = dict(os.environ)
    # Disable the accelerator-plugin sitecustomize hook (it registers the
    # TPU backend for every interpreter and wins over JAX_PLATFORMS).
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "").replace(
            "--xla_force_host_platform_device_count=8", "").strip()
        + " --xla_force_host_platform_device_count=8").strip()
    env["JAX_ENABLE_X64"] = "0"  # driver dry-runs in default f32
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT],
        cwd=_REPO, env=env, capture_output=True, text=True, timeout=590)
    assert proc.returncode == 0, (
        f"dryrun_multichip(8) failed\nstdout:\n{proc.stdout}\n"
        f"stderr:\n{proc.stderr}")
    assert "DRYRUN_OK" in proc.stdout


def test_entry_compiles():
    """The single-chip contract: entry() returns a jittable step + args."""
    import jax

    import __graft_entry__

    fn, args = __graft_entry__.entry()
    jax.jit(fn).lower(*args)  # trace + lower only; no execution needed
