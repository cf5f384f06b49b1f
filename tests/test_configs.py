"""Config smoke tests: every config x mode builds and runs batched episodes.

Engine analogue of the reference all-configs smoke test
(/root/reference/tests/configs/configs_test.py:31-58), but batched and
jitted. Image renderers are swapped for cheap factor renderers for speed.
"""

import importlib

import numpy as np
import pytest

import jax

from spriteworld_tpu.core import environment
from spriteworld_tpu.core import renderers

CONFIGS = [
    ("spriteworld_tpu.configs.cobra.exploration", (None,)),
    ("spriteworld_tpu.configs.cobra.goal_finding_new_position",
     ("train", "test")),
    ("spriteworld_tpu.configs.cobra.goal_finding_new_shape",
     ("train", "test")),
    ("spriteworld_tpu.configs.cobra.goal_finding_more_targets",
     ("train", "test")),
    ("spriteworld_tpu.configs.cobra.goal_finding_more_distractors",
     ("train", "test")),
    ("spriteworld_tpu.configs.cobra.clustering", ("train", "test")),
    ("spriteworld_tpu.configs.cobra.sorting", ("train", "test")),
    ("spriteworld_tpu.configs.examples.goal_finding_embodied", (None,)),
    ("spriteworld_tpu.configs.examples.goal_finding_clustering",
     ("train", "test")),
]

FLAT = [(path, mode) for path, modes in CONFIGS for mode in modes]


@pytest.mark.parametrize("path,mode", FLAT)
def test_config_runs_batched(path, mode):
    module = importlib.import_module(path)
    config = module.get_config(mode) if mode else module.get_config()
    # Cheap renderers for the smoke test (reference does the same with {}).
    config["renderers"] = {"factors": renderers.SpriteFactors(),
                           "success": renderers.Success()}
    env = environment.Environment(**config)
    benv = environment.BatchedEnvironment(env, 4)
    state, ts = benv.reset(jax.random.key(0))
    assert ts.step_type.shape == (4,)
    for i in range(3):
        acts = benv.sample_actions(jax.random.key(i))
        state, ts = benv.step(state, acts)
    rewards = np.asarray(ts.reward)
    assert rewards.shape == (4,)
    # NaN rewards are part of the contract for filtered/clustered tasks
    # (tasks.py:144-146), but infinities never are.
    assert not np.isinf(rewards).any()
    if "clustering" not in path and "sorting" not in path:
        assert np.isfinite(rewards).all()
    obs = ts.observation
    assert obs["factors"]["factors"].shape[0] == 4
