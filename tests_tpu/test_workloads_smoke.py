"""One-step-per-workload smoke on the live TPU backend.

Every BASELINE workload graph (BASELINE.md:25-28; builders shared with
bench.py) — the five workloads, with image64 in all three recorded modes
(AA=1, AA=5 exact, AA=5 fast), seven env builds total — must reset and
step end-to-end on the real chip.
This gate exists because round 3 shipped a kernel whose trace error only
manifested on the TPU auto-selected path (VERDICT r3 item 5): a tiny-batch
reset + 2 steps here catches any break in the product render path before a
snapshot can land it.

Checks per workload: obs shapes/dtypes match the env's observation_spec,
rewards are finite (after the NaN-filter contract is masked out), and the
image observation actually contains painted pixels.
"""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")  # bench.py lives at the repo root

import bench  # noqa: E402


def _builders():
    return {
        "image64_aa1": lambda: bench.build_env(anti_aliasing=1),
        "image64_aa5": lambda: bench.build_env(anti_aliasing=5),
        "image64_aa5_fast": lambda: bench.build_env(
            anti_aliasing=5, pil_exact=False),
        "factors": bench.build_factors_env,
        "clustering": bench.WORKLOADS["clustering"][1],
        "sorting": bench.WORKLOADS["sorting"][1],
        "embodied": bench.WORKLOADS["embodied"][1],
    }


@pytest.mark.parametrize("name", list(_builders()))
def test_workload_resets_and_steps_on_tpu(name):
    env = _builders()[name]()
    b = 8
    keys = jax.random.split(jax.random.key(0), b)
    state, ts = jax.jit(env.reset_batch)(keys)

    specs = env.observation_spec()
    for _ in range(2):
        acts = jax.vmap(env.sample_action)(
            jax.random.split(jax.random.key(1), b))
        state, ts = jax.jit(env.step_batch)(state, acts)

    obs = jax.tree.map(np.asarray, ts.observation)
    flat_obs, treedef_obs = jax.tree.flatten(obs)
    flat_spec, treedef_spec = jax.tree.flatten(specs)
    assert treedef_obs == treedef_spec
    for leaf, spec in zip(flat_obs, flat_spec):
        assert leaf.shape == (b,) + spec.shape, (name, leaf.shape, spec)
        assert leaf.dtype == spec.dtype, (name, leaf.dtype, spec)

    rewards = np.asarray(ts.reward)
    # NaN is part of the FindGoalPosition empty-filter contract; everything
    # else must be finite.
    assert not np.isinf(rewards).any(), (name, rewards)

    if "image" in obs:
        img = obs["image"]
        assert img.dtype == np.uint8
        assert (img.reshape(b, -1).max(axis=1) > 0).all(), \
            f"{name}: blank render"
