"""Test configuration: two tiers.

Default tier — force CPU JAX with a virtual 8-device mesh.  The reference
had no multi-device tests; here sharded paths are validated on
``xla_force_host_platform_device_count=8`` CPU devices (SURVEY.md §4).  x64
is enabled so the exact-atan2 conformance path matches the reference's f64
math.  Pallas kernels run under the interpreter in this tier.

TPU tier — ``TPU_SDR_TEST_PLATFORM=tpu pytest tests/`` keeps the process's
real TPU backend and runs ONLY the ``@pytest.mark.tpu`` tests: Mosaic
(non-interpreted) executions of the Pallas kernels, so an interpret-vs-
compiled divergence cannot ship silently.  Everything else is skipped
(those tests assume the CPU mesh / x64 semantics).
"""

import os

import pytest

TPU_TIER = os.environ.get("TPU_SDR_TEST_PLATFORM", "").lower() == "tpu"

if not TPU_TIER:
    # The session environment may pin JAX_PLATFORMS to the TPU platform;
    # tests must run on the virtual CPU mesh, so override unconditionally.
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if not TPU_TIER:
    # The env var alone still lets backend discovery initialize the TPU
    # plugin (whose tunnel can block indefinitely); the config route skips
    # it entirely.
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: XLA-CPU compiles are expensive on this
# machine; cache them across test runs.
_cache_dir = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache_dir))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "tpu: Mosaic-compiled kernel test; needs a real TPU backend "
        "(run with TPU_SDR_TEST_PLATFORM=tpu)")
    config.addinivalue_line(
        "markers", "slow: multi-process / long-running integration test")


def pytest_collection_modifyitems(config, items):
    if TPU_TIER:
        on_tpu = jax.default_backend() == "tpu"
        for item in items:
            if "tpu" not in item.keywords:
                item.add_marker(pytest.mark.skip(
                    reason="TPU tier runs only @pytest.mark.tpu tests"))
            elif not on_tpu:
                item.add_marker(pytest.mark.skip(
                    reason="no real TPU backend available"))
    else:
        for item in items:
            if "tpu" in item.keywords:
                item.add_marker(pytest.mark.skip(
                    reason="needs TPU_SDR_TEST_PLATFORM=tpu + real TPU"))
