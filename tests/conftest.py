"""Test configuration: force a virtual 8-device CPU platform.

Sharding/pjit tests need multiple devices; the standard JAX recipe is a fake
multi-device CPU host (`--xla_force_host_platform_device_count=8`). This must
be set before jax initializes, hence here in conftest at import time.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon sitecustomize (TPU tunnel) pins jax_platforms before conftest
# runs; the env var alone is too late. Re-pin to CPU through the config so
# the virtual 8-device host platform actually takes effect.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: identical environment programs are re-jitted
# by many tests (fresh object => fresh jit cache entry); the on-disk cache
# turns those recompiles into fast loads.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
