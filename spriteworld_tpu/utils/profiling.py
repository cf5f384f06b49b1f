"""Tracing/profiling and numeric-debug helpers.

The reference has no tracing or sanitizers (SURVEY.md §5.1-5.2). The
TPU-native equivalents:

  * `trace(path)` — capture a jax.profiler trace (TensorBoard-viewable) of a
    code region; jitted env programs appear as named XLA ops.
  * `annotate(name)` — `jax.named_scope` wrapper so reset/step/render show
    up as labeled regions inside traces.
  * `enable_debug_checks()` — turns on jax_debug_nans/jax_debug_infs, the
    jit-level sanitizer for the engine (reference had nothing to detect
    NaNs besides its nan-aware aggregators).
  * `StepTimer` — a steps/s counter (the BASELINE metric) with correct
    device synchronization: under the axon-relay TPU backend
    `block_until_ready` can return early, so the timer syncs by fetching a
    scalar to the host.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax
import numpy as np


def annotate(name: str):
    """Named scope visible in profiler traces (use around traced code)."""
    return jax.named_scope(name)


@contextlib.contextmanager
def trace(path: str, create_perfetto_link: bool = False):
    """Capture a profiler trace of the enclosed region to `path`."""
    jax.profiler.start_trace(path, create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def enable_debug_checks(nans: bool = True, infs: bool = True) -> None:
    """Enable jit-level NaN/Inf detection (recompiles affected programs)."""
    jax.config.update("jax_debug_nans", bool(nans))
    jax.config.update("jax_debug_infs", bool(infs))


def sync(value) -> None:
    """Synchronize with device work by materializing one leaf on the host."""
    leaf = jax.tree.leaves(value)[0]
    np.asarray(jax.device_get(leaf if leaf.ndim == 0 else leaf.ravel()[0]))


class StepTimer:
    """Wall-clock env-steps/s measurement across rollout chunks."""

    def __init__(self):
        self._steps = 0
        self._elapsed = 0.0
        self._t0: Optional[float] = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self, num_steps: int, sync_on=None) -> None:
        if sync_on is not None:
            sync(sync_on)
        self._elapsed += time.perf_counter() - self._t0
        self._steps += int(num_steps)
        self._t0 = None

    @property
    def steps_per_sec(self) -> float:
        return self._steps / self._elapsed if self._elapsed else 0.0
