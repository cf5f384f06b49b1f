"""Generate the README demo GIFs with the engine (reference gifs/ assets).

The reference ships three episode GIFs as static assets
(/root/reference/gifs/{clustering,goal_finding,sorting}_video.gif) with no
code to regenerate them. This script reproduces them from the engine using
scripted greedy agents (click the worst-placed sprite, drag it toward its
goal), so each GIF shows the task actually being solved.

One-liner (CPU is fine; ~30s total):

  JAX_PLATFORMS=cpu python make_gifs.py

writes gifs/clustering_video.gif, gifs/goal_finding_video.gif,
gifs/sorting_video.gif.
"""

from __future__ import annotations

import functools
import importlib
import os

from absl import app
from absl import flags
import jax
import jax.numpy as jnp
import numpy as np

from spriteworld_tpu.core import environment as env_lib
from spriteworld_tpu.core import tasks
from spriteworld_tpu.ops import geometry
from spriteworld_tpu.utils import media

FLAGS = flags.FLAGS
flags.DEFINE_string("out_dir", "gifs", "Output directory.")
flags.DEFINE_integer("scale", 3, "Nearest-neighbour upscale factor.")
flags.DEFINE_integer("seed", 1, "Episode seed.")

_SELECT_MOVE_SCALE = 0.25  # configs/cobra/common.py action space
# Cap the per-step drag so the GIFs show visible progress instead of a
# 1-3 step teleport (|motion| <= _SPEED_CAP * scale per step).
_SPEED_CAP = 0.14


def _capped(delta: np.ndarray) -> np.ndarray:
    norm = float(np.linalg.norm(delta))
    if norm > _SPEED_CAP:
        delta = delta * (_SPEED_CAP / norm)
    return delta


@jax.jit
def _topmost_at(factors, num_sprites, point):
    """Which sprite would a click at `point` select (SelectMove's topmost
    rule, core/actions.py:81-87)? Returns (index, any_hit)."""
    hits = geometry.sprites_containing_point(factors[0], point)
    return geometry.topmost_hit(hits, num_sprites[0])


def _act_toward(state, k, pos, target):
    """Click sprite k at `pos` and drag toward `target` — but only if the
    click would actually select k (sprites crossing paths occlude each
    other; clicking through the occluder moves the wrong sprite and the
    agents deadlock). Returns the action or None."""
    idx, hit = _topmost_at(state.factors, state.num_sprites,
                           jnp.asarray(pos, jnp.float32))
    if not bool(hit) or int(idx) != int(k):
        return None
    delta = _capped(np.clip((target - pos) / _SELECT_MOVE_SCALE, -0.5, 0.5))
    return np.concatenate([pos, 0.5 + delta])[None].astype(np.float32)


def _goal_policy(env):
    """Greedy SelectMove agent for FindGoalPosition / MetaAggregated tasks:
    click the filtered sprite farthest outside its terminate distance and
    drag it toward its subtask's goal (clipped to the action-space scale)."""
    task = env.task
    subs = ([task] if isinstance(task, tasks.FindGoalPosition)
            else list(task._subtasks))

    @jax.jit
    def probe(factors, num):
        f, n = factors[0], num[0]
        masks = jnp.stack([t._filter_mask(f, n) for t in subs])      # [S, K]
        deficits = jnp.stack([
            -t._per_sprite_rewards(f) / t._raw_reward_multiplier
            for t in subs])                                           # [S, K]
        return masks, deficits

    goals = np.stack([np.asarray(t._goal_position) for t in subs])

    def policy(key, state):
        del key
        masks, deficits = jax.tree.map(np.asarray, probe(
            state.factors, state.num_sprites))
        deficits = np.where(masks, deficits, -np.inf)
        f = np.asarray(state.factors)[0]
        flat = np.argsort(-deficits, axis=None)
        for si, ki in zip(*np.unravel_index(flat, deficits.shape)):
            if deficits[si, ki] <= 0:
                break  # the rest are in place
            action = _act_toward(state, ki, f[ki, 0:2], goals[si])
            if action is not None:
                return action
        return np.array([[0.0, 0.0, 0.5, 0.5]], np.float32)  # idle no-op

    return policy


def _clustering_policy(env):
    """Greedy SelectMove agent for the Clustering task: drag each sprite
    toward a fixed well-separated anchor for its cluster until the
    Davies-Bouldin metric clears the termination threshold."""
    task = env.task
    anchors = np.array([[0.22, 0.30], [0.78, 0.70],
                        [0.22, 0.70], [0.78, 0.30]], np.float32)

    @jax.jit
    def probe(factors, num):
        return task._membership(factors[0], num[0])  # bool[K, C]

    def policy(key, state):
        del key
        member = np.asarray(probe(state.factors, state.num_sprites))
        f = np.asarray(state.factors)[0]
        k_idx, c_idx = np.nonzero(member)
        if not len(k_idx):
            return np.array([[0.0, 0.0, 0.5, 0.5]], np.float32)
        # Same-cluster sprites get slightly offset targets so they gather
        # around the anchor instead of stacking (a stacked sprite occludes
        # its cluster-mate's click point).
        offsets = (np.stack([k_idx % 2, (k_idx // 2) % 2], -1) - 0.5) * 0.09
        targets = anchors[c_idx] + offsets
        dists = np.linalg.norm(f[k_idx, 0:2] - targets, axis=-1)
        for j in np.argsort(-dists):
            if dists[j] < 0.02:
                break
            action = _act_toward(state, k_idx[j], f[k_idx[j], 0:2],
                                 targets[j])
            if action is not None:
                return action
        return np.array([[0.0, 0.0, 0.5, 0.5]], np.float32)

    return policy


_CONFIGS = {
    "goal_finding_video": (
        "spriteworld_tpu.configs.cobra.goal_finding_new_shape", _goal_policy),
    "clustering_video": (
        "spriteworld_tpu.configs.cobra.clustering", _clustering_policy),
    "sorting_video": (
        "spriteworld_tpu.configs.cobra.sorting", _goal_policy),
}


def make_gif(name: str, out_dir: str, seed: int, scale: int) -> str:
    module, policy_fn = _CONFIGS[name]
    config = importlib.import_module(module).get_config("train")
    env = env_lib.Environment(**config)
    frames = media.record_episode(
        env, jax.random.key(seed), max_steps=60,
        policy=policy_fn(env))
    path = os.path.join(out_dir, f"{name}.gif")
    media.save_gif(frames, path, fps=8, scale=scale)
    return path


def main(argv):
    del argv
    os.makedirs(FLAGS.out_dir, exist_ok=True)
    for name in _CONFIGS:
        path = make_gif(name, FLAGS.out_dir, FLAGS.seed, FLAGS.scale)
        print(path)


if __name__ == "__main__":
    app.run(main)
