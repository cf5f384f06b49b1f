"""The end-to-end training example: sharded rollout+update in one program.

Runs REINFORCE on the factors goal-finding env over the virtual 8-device
mesh and checks that the single-program train step executes, stays finite,
and actually improves the dense goal-distance reward over a short run
(the policy only has to learn "click the target, drag toward the goal").
"""

import numpy as np

import train_example


def test_train_step_runs_and_improves():
    _, history = train_example.train(
        num_envs=64, iters=60, rollout_steps=10, seed=0, log_every=59)
    first, last = history[0], history[-1]
    assert np.isfinite(float(first["loss"]))
    assert np.isfinite(float(last["loss"]))
    # Dense rewards: a learning policy must beat its own untrained start.
    assert float(last["reward_mean"]) > float(first["reward_mean"])


def test_image_policy_train_step_runs():
    """The rendered-RGB CNN pipeline (rasterizer feeding a conv policy,
    one fused rollout+update program) executes and stays finite."""
    _, history = train_example.train(
        num_envs=16, iters=3, rollout_steps=4, seed=0, log_every=2,
        obs_mode="image", image_size=(16, 16))
    for m in history:
        assert np.isfinite(float(m["loss"]))
        assert np.isfinite(float(m["reward_mean"]))
