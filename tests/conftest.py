"""Test configuration: force CPU JAX with a virtual 8-device mesh.

The reference had no multi-device tests; here sharded paths are validated on
``xla_force_host_platform_device_count=8`` CPU devices (SURVEY.md §4).  x64 is
enabled so the exact-atan2 conformance path matches the reference's f64 math.
"""

import os

# The session environment may pin JAX_PLATFORMS to the TPU platform; tests
# must run on the virtual CPU mesh, so override unconditionally.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The env var alone still lets backend discovery initialize the TPU plugin
# (whose tunnel can block indefinitely); the config route skips it entirely.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: XLA-CPU compiles are expensive on this
# machine; cache them across test runs.
_cache_dir = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache_dir))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
