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
