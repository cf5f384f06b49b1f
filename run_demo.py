"""Interactive demo CLI (rebuild of /root/reference/run_demo.py:38-56).

Usage:
  python run_demo.py --config=spriteworld_tpu.configs.cobra.clustering \
      --mode=train --render_size=256
"""

import importlib

from absl import app
from absl import flags

from spriteworld_tpu import demo_ui

FLAGS = flags.FLAGS
flags.DEFINE_string("config", "spriteworld_tpu.configs.cobra.clustering",
                    "Module name of task config to use.")
flags.DEFINE_string("mode", "train", "Task mode, 'train' or 'test'.")
flags.DEFINE_boolean("task_hsv_colors", True,
                     "Whether the config's colors are in HSV space.")
flags.DEFINE_integer("render_size", 256,
                     "Height and width of the output image.")
# Default matches the reference demo (/root/reference/run_demo.py:45): the
# interactive UI renders one frame per user action, so AA=10's cost is
# invisible there and the out-of-the-box image matches the reference's.
flags.DEFINE_integer("anti_aliasing", 10, "Renderer anti-aliasing factor.")


def main(argv):
    del argv
    config = importlib.import_module(FLAGS.config).get_config(FLAGS.mode)
    demo_ui.setup_run_ui(config, FLAGS.render_size, FLAGS.task_hsv_colors,
                         FLAGS.anti_aliasing)


if __name__ == "__main__":
    app.run(main)
