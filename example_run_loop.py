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
    episode_rewards = [[] for _ in range(FLAGS.num_envs)]
    episodes_done = 0
    step_idx = 0
    target = FLAGS.num_episodes * FLAGS.num_envs

    while episodes_done < target:
        key, sub = jax.random.split(key)
        state, ts = benv.step(state, benv.sample_actions(sub))
        step_idx += 1
        rewards = np.asarray(ts.reward)
        step_types = np.asarray(ts.step_type)
        success = np.asarray(ts.observation["success"])
        for lane in range(FLAGS.num_envs):
            if step_types[lane] == 0:  # FIRST after auto-reset
                continue
            episode_rewards[lane].append(rewards[lane])
            if step_types[lane] == 2:  # LAST
                episodes_done += 1
                logging.info(
                    "Episode done (lane %d). Success = %s, Reward = %s",
                    lane, bool(success[lane]),
                    float(np.nanmean(episode_rewards[lane])))
                episode_rewards[lane] = []


if __name__ == "__main__":
    logging.set_verbosity(logging.INFO)
    app.run(main)
