"""Test configuration: force an 8-device virtual CPU mesh.

IMPORTANT environment quirk: /root/.axon_site/sitecustomize.py imports jax
and registers the real-TPU (axon) PJRT plugin in every python process, and
the session env pins JAX_PLATFORMS=axon. Setting env vars here is too late
(jax is already imported) — the ONLY reliable way to keep tests off the TPU
tunnel is jax.config.update after import, before first backend use.
x64 is enabled so numerical checks against the reference's float64 contract
hold. The persistent compile cache matters: this container has ~0.1-1s
per-compile latency, so cold runs are slow and warm runs are fine.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/cosmomc_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
