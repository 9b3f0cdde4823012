"""Test configuration: force an 8-virtual-device CPU backend so multi-chip
sharding paths compile and run without TPU hardware.

NOTE: this sandbox's axon TPU plugin force-sets ``jax_platforms = "axon,cpu"``
at interpreter start (sitecustomize), so the env var alone is not enough —
we must override via jax.config after import.
"""

import os

# must be set before jax initializes its backends
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# persistent compile cache across pytest runs
jax.config.update("jax_compilation_cache_dir", "/tmp/nvsf_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

assert jax.local_device_count() == 8, "expected 8 virtual CPU devices"
