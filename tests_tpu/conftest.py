"""TPU-only test tree: no platform pinning (unlike tests/conftest.py).

Run on the real chip:
    PYTHONPATH=/root/repo:/root/.axon_site python -m pytest tests_tpu/ -q
Everything here skips unless jax.default_backend() == "tpu".
"""

import jax
import pytest


def pytest_collection_modifyitems(config, items):
    if jax.default_backend() == "tpu":
        return
    skip = pytest.mark.skip(reason="requires a real TPU backend")
    for item in items:
        item.add_marker(skip)
