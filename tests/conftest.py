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

import os

import pytest

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/cosmomc_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


def pytest_collection_modifyitems(config, items):
    """`slow`-marked tests (multi-minute end-to-end runs: the mnu
    minimization e2e, the sigma8 massive-nu power run, the grid driver
    cell) are opt-in — COSMOMC_SLOW=1 or `-m slow` runs them; the default
    suite stays minutes-scale for CI/driver runs. Mirrors the documented
    opt-in for the full-Boltzmann reverse-mode test."""
    if os.environ.get("COSMOMC_SLOW") == "1" or "slow" in (
            config.getoption("-m") or ""):
        return
    skip = pytest.mark.skip(reason="slow e2e (opt-in: COSMOMC_SLOW=1)")
    for it in items:
        if "slow" in it.keywords:
            it.add_marker(skip)
