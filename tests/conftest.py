"""Test configuration: force an 8-device virtual CPU backend so sharding
tests run without TPU hardware (the reference has no fake-backend story;
SURVEY.md section 4), and enable the persistent compilation cache so
repeated test runs skip XLA recompiles.

NOTE: this environment's sitecustomize imports jax at interpreter start
(with JAX_PLATFORMS=axon), so env vars are too late — the platform must
be overridden through jax.config before first backend use.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_test")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

assert jax.devices()[0].platform == "cpu", "tests must run on CPU mesh"
assert len(jax.devices()) == 8, "tests expect 8 virtual CPU devices"
