"""Test configuration: force an 8-device virtual CPU mesh.

Tests must not depend on the (single) real TPU chip; multi-chip sharding is
validated on a virtual host-platform mesh, per the build contract. x64 is
enabled so numerical checks against the reference's float64 contract hold.
"""

import os

# force CPU: the session env may pin JAX_PLATFORMS to the real TPU backend
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/cosmomc_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

