"""Example run loop: random agent on a config, batched on device.

Rebuild of /root/reference/example_run_loop.py:38-84 with a TPU-native twist:
`--num_envs` lanes run in lockstep under jit; per-episode success and
nan-mean returns are aggregated on device. `--num_envs=1` reproduces the
reference's single-env logging behavior.

Usage:
  python example_run_loop.py --config=spriteworld_tpu.configs.cobra.clustering \
      --mode=train --num_episodes=2 --num_envs=64
"""

import importlib

from absl import app
from absl import flags
from absl import logging
import jax
import numpy as np

from spriteworld_tpu.core import environment
from spriteworld_tpu.core import renderers

FLAGS = flags.FLAGS
flags.DEFINE_string("config",
                    "spriteworld_tpu.configs.cobra.goal_finding_new_shape",
                    "Module name of task config to use.")
flags.DEFINE_string("mode", "train", "'train' or 'test' mode.")
flags.DEFINE_integer("num_episodes", 2, "Number of episodes to run.")
flags.DEFINE_integer("num_envs", 16, "Parallel environment lanes.")
flags.DEFINE_boolean("render_images", False,
                     "Keep the image renderer (slower on CPU).")


def main(argv):
    del argv
    config = importlib.import_module(FLAGS.config).get_config(FLAGS.mode)
    if not FLAGS.render_images:
        config["renderers"] = {"success": renderers.Success()}
    else:
        config["renderers"]["success"] = renderers.Success()

    env = environment.Environment(**config)
    benv = environment.BatchedEnvironment(env, FLAGS.num_envs)

    key = jax.random.key(0)
    state, ts = benv.reset(key)
    # Vectorized per-lane episode accumulators (the masked-numpy pattern
    # ShardedRunner.evaluate uses): nan-mean over an episode's rewards is
    # sum-of-finite / count-of-finite, tracked as two [num_envs] vectors —
    # O(1) numpy work per step instead of an O(num_envs) Python loop.
    ep_reward_sum = np.zeros(FLAGS.num_envs, np.float64)
    ep_reward_cnt = np.zeros(FLAGS.num_envs, np.int64)
    episodes_done = 0
    target = FLAGS.num_episodes * FLAGS.num_envs

    while episodes_done < target:
        key, sub = jax.random.split(key)
        state, ts = benv.step(state, benv.sample_actions(sub))
        rewards = np.asarray(ts.reward)
        step_types = np.asarray(ts.step_type)
        success = np.asarray(ts.observation["success"])
        # FIRST lanes (post-auto-reset) contribute nothing, like the
        # reference's reset steps (example_run_loop.py:72-74).
        counted = (step_types != 0) & ~np.isnan(rewards)
        ep_reward_sum += np.where(counted, rewards, 0.0)
        ep_reward_cnt += counted
        done_lanes = np.nonzero(step_types == 2)[0]  # LAST
        for lane in done_lanes:  # iterates finished episodes only
            episodes_done += 1
            mean_r = (ep_reward_sum[lane] / ep_reward_cnt[lane]
                      if ep_reward_cnt[lane] else float("nan"))
            logging.info(
                "Episode done (lane %d). Success = %s, Reward = %s",
                int(lane), bool(success[lane]), float(mean_r))
        ep_reward_sum[done_lanes] = 0.0
        ep_reward_cnt[done_lanes] = 0


if __name__ == "__main__":
    logging.set_verbosity(logging.INFO)
    app.run(main)
