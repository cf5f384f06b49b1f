"""Profiling/debug helpers (SURVEY §5.1-5.2 auxiliary subsystems)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spriteworld_tpu.utils import profiling


def test_step_timer_accumulates_across_chunks():
    t = profiling.StepTimer()
    x = jnp.arange(8.0)
    for _ in range(3):
        t.start()
        y = jnp.sin(x).sum()
        t.stop(100, sync_on=y)
    assert t.steps_per_sec > 0
    # 300 steps over a strictly positive elapsed time.
    assert t._steps == 300 and t._elapsed > 0


def test_annotate_is_traceable():
    @jax.jit
    def f(x):
        with profiling.annotate("square"):
            return x * x

    np.testing.assert_array_equal(np.asarray(f(jnp.arange(4.0))),
                                  np.arange(4.0) ** 2)


def test_trace_writes_profile(tmp_path):
    with profiling.trace(str(tmp_path)):
        jnp.ones((8, 8)).sum().block_until_ready()
    # jax.profiler drops a dated profile dir under plugins/profile/.
    assert list(tmp_path.glob("plugins/profile/*"))


def test_enable_debug_checks_flags_nan():
    profiling.enable_debug_checks(nans=True, infs=False)
    try:
        with pytest.raises(FloatingPointError):
            jax.jit(lambda x: x / 0.0 * 0.0)(jnp.float32(1.0)
                                             ).block_until_ready()
    finally:
        profiling.enable_debug_checks(nans=False, infs=False)


def test_sync_materializes_scalar_and_array():
    profiling.sync(jnp.float32(3.0))
    profiling.sync({"a": jnp.arange(6).reshape(2, 3)})
