import os

# Correctness tests run on CPU in float64 (the reference is all-f64,
# reference: set_global_definitions.h:128-134) with a virtual 8-device mesh
# for the distributed tests.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# Some environments pre-import jax with an accelerator platform from
# sitecustomize; as long as no backend is initialized yet these config
# updates still force the CPU + 8-virtual-device setup the tests need.
try:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:
    pass

jax.config.update("jax_enable_x64", True)


# --- fast/slow tiering -------------------------------------------------
# The heavy end-to-end modules (real-data USWC regressions and the long
# distributed/oracle runs) are marked slow at collection; the fast tier
# (`pytest -m "not slow"`) is the per-push CI gate (< 3 min), the full
# suite the nightly/manual tier (reference CI splits likewise:
# .github/workflows/automated_testing_workflow_containerized_gfortran.yml).
_SLOW_MODULES = {
    "test_realcases_regression",
    "test_distributed_realcase",
    "test_invariance",
    "test_nested_flow",
}


def pytest_collection_modifyitems(config, items):
    import pytest
    for item in items:
        if item.module.__name__ in _SLOW_MODULES:
            item.add_marker(pytest.mark.slow)
# persistent compile cache: the big stepper program compiles once per machine
# NOTE: the persistent compilation cache is deliberately NOT enabled for
# the test suite: entries half-written by timed-out/killed runs make the
# zstandard reader abort() the whole process mid-suite (observed thrice on
# this host).  Each pytest process compiles fresh; the perf tools
# (bench/roofline/profile_*) still opt in individually.
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
