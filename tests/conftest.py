"""Test configuration: force CPU with 8 virtual devices so multi-chip sharding
paths compile and execute without TPU hardware (the driver separately
dry-runs the multi-chip path)."""

import os

# Hard override: the surrounding environment pins JAX_PLATFORMS to the real
# TPU tunnel; unit tests must run on the virtual CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon sitecustomize registers the TPU backend programmatically and can
# override JAX_PLATFORMS; this config update is authoritative (must run
# before any backend is initialized).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
# Persistent compile cache makes repeated test runs fast.
jax.config.update("jax_compilation_cache_dir", "/tmp/htrvt_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
