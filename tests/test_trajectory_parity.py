"""Env-level trajectory parity vs the live reference, across action spaces,
task families, and image observations.

Extends the injected-scene harness of test_environment.py (SelectMove +
FindGoalPosition only) to every action-space x task family the reference
ships: DragAndDrop and Embodied at the environment level
(/root/reference/spriteworld/action_spaces.py:114-221,
tests/action_spaces_test.py:185-241), Clustering and sorting-style
MetaAggregated episodes (/root/reference/spriteworld/tasks.py:161-296), and
a pixel-level image-observation comparison along a trajectory
(/root/reference/spriteworld/renderers/pil_renderer.py:66-91; bit-exact at
anti_aliasing=1).

Both engines replay the SAME injected scene on every (auto-)reset, so the
streams stay aligned across episode boundaries.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spriteworld_tpu.core import actions
from spriteworld_tpu.core import distributions as distribs
from spriteworld_tpu.core import environment
from spriteworld_tpu.core import renderers
from spriteworld_tpu.core import state as state_lib
from spriteworld_tpu.core import tasks

import ref_oracle
from test_environment import FixedGenerator


def _scene(rng, k, hues=None, scale=0.2):
    f = np.tile(state_lib.DEFAULT_FACTORS, (k, 1)).astype(np.float32)
    f[:, state_lib.X] = rng.uniform(0.25, 0.75, k)
    f[:, state_lib.Y] = rng.uniform(0.25, 0.75, k)
    f[:, state_lib.SHAPE] = rng.integers(1, 7, k)
    f[:, state_lib.SCALE] = scale
    f[:, state_lib.C0] = hues if hues is not None else rng.uniform(0, 1, k)
    f[:, state_lib.C1] = 1.0
    f[:, state_lib.C2] = 1.0
    return f


def _ref_env(factors, k, ref_task, ref_action_space, max_len,
             ref_renderers=None):
    ref_env_mod = ref_oracle.ref_module("environment")

    def fresh_sprites():
        return [ref_oracle.make_ref_sprite(factors[i]) for i in range(k)]

    return ref_env_mod.Environment(
        task=ref_task,
        action_space=ref_action_space,
        renderers=ref_renderers or {},
        init_sprites=fresh_sprites,
        max_episode_length=max_len)


def _run_parity(ours_env, ref_env, action_seq, k, reward_tol=2e-4,
                label="", image_key=None):
    state, ts = jax.jit(ours_env.reset)(jax.random.key(0))
    ref_ts = ref_env.reset()
    step = jax.jit(ours_env.step)
    if image_key:
        np.testing.assert_array_equal(
            np.asarray(ts.observation[image_key]),
            ref_ts.observation[image_key],
            err_msg=f"{label}: image mismatch at reset")

    for t, action in enumerate(action_seq):
        state, ts = step(state, jnp.asarray(action))
        ref_ts = ref_env.step(action)
        assert int(ts.step_type) == int(ref_ts.step_type), (
            f"{label}: step_type diverged at t={t}")
        if ref_ts.reward is not None:
            ours_r = float(ts.reward)
            if np.isnan(ref_ts.reward):
                assert np.isnan(ours_r), f"{label}: expected NaN at t={t}"
            else:
                assert ours_r == pytest.approx(
                    ref_ts.reward, abs=reward_tol), f"{label}: reward t={t}"
        ref_pos = np.array([s.position for s in ref_env._sprites])
        np.testing.assert_allclose(
            np.asarray(state.factors[:k, :2]), ref_pos, atol=1e-5,
            err_msg=f"{label}: positions diverged at t={t}")
        if image_key:
            np.testing.assert_array_equal(
                np.asarray(ts.observation[image_key]),
                ref_ts.observation[image_key],
                err_msg=f"{label}: image mismatch at t={t}")


def test_drag_and_drop_trajectory_parity():
    """DragAndDrop + FindGoalPosition, 12 steps x 3 trials, env level."""
    ref_tasks = ref_oracle.ref_module("tasks")
    ref_as = ref_oracle.ref_module("action_spaces")
    ref_fd = ref_oracle.ref_module("factor_distributions")
    rng = np.random.default_rng(11)
    for trial in range(3):
        k = 3
        f = _scene(rng, k)
        ours_env = environment.Environment(
            task=tasks.FindGoalPosition(
                filter_distrib=distribs.Continuous("c0", 0.0, 0.5),
                goal_position=(0.3, 0.7), terminate_distance=0.1),
            action_space=actions.DragAndDrop(scale=0.5),
            renderers={"success": renderers.Success()},
            init_sprites=FixedGenerator(f),
            max_episode_length=8)
        ref_env = _ref_env(
            f, k,
            ref_tasks.FindGoalPosition(
                filter_distrib=ref_fd.Continuous("c0", 0.0, 0.5),
                goal_position=(0.3, 0.7), terminate_distance=0.1),
            ref_as.DragAndDrop(scale=0.5), 8)
        # Aim some drags at sprites so carries actually happen.
        seq = []
        for t in range(12):
            if t % 2 == 0:
                src = f[rng.integers(0, k), :2] + rng.normal(0, 0.01, 2)
            else:
                src = rng.uniform(0, 1, 2)
            seq.append(np.clip(np.concatenate(
                [src, rng.uniform(0, 1, 2)]), 0, 1).astype(np.float32))
        _run_parity(ours_env, ref_env, seq, k, label=f"dragdrop[{trial}]")


def test_embodied_trajectory_parity():
    """Embodied adhere-and-carry + FindGoalPosition, env level."""
    ref_tasks = ref_oracle.ref_module("tasks")
    ref_as = ref_oracle.ref_module("action_spaces")
    ref_fd = ref_oracle.ref_module("factor_distributions")
    rng = np.random.default_rng(12)
    for trial in range(3):
        k = 4
        f = _scene(rng, k, scale=0.25)
        # Last sprite is the agent body (reference takes sprites[-1],
        # action_spaces.py:172-174); park it on top of sprite 0 so carries
        # trigger.
        f[-1, state_lib.X:state_lib.Y + 1] = f[0, state_lib.X:state_lib.Y + 1]
        f[-1, state_lib.SCALE] = 0.07
        ours_env = environment.Environment(
            task=tasks.FindGoalPosition(
                filter_distrib=distribs.Continuous("c0", 0.0, 0.5),
                terminate_distance=0.1),
            action_space=actions.Embodied(step_size=0.05),
            renderers={"success": renderers.Success()},
            init_sprites=FixedGenerator(f),
            max_episode_length=10)
        ref_env = _ref_env(
            f, k,
            ref_tasks.FindGoalPosition(
                filter_distrib=ref_fd.Continuous("c0", 0.0, 0.5),
                terminate_distance=0.1),
            ref_as.Embodied(step_size=0.05), 10)
        seq = [np.array([rng.integers(0, 2), rng.integers(0, 4)], np.int64)
               for _ in range(14)]
        _run_parity(ours_env, ref_env, seq, k, label=f"embodied[{trial}]")


def test_clustering_trajectory_parity():
    """Clustering episodes: JAX Davies-Bouldin vs sklearn along a rollout."""
    ref_tasks = ref_oracle.ref_module("tasks")
    ref_as = ref_oracle.ref_module("action_spaces")
    ref_fd = ref_oracle.ref_module("factor_distributions")
    rng = np.random.default_rng(13)
    for trial in range(3):
        k = 4
        hues = np.array([0.05, 0.1, 0.55, 0.6])  # 2 hue clusters x 2 sprites
        f = _scene(rng, k, hues=hues)
        cluster_specs = [(0.0, 0.2), (0.5, 0.7)]
        ours_env = environment.Environment(
            task=tasks.Clustering(
                cluster_distribs=[distribs.Continuous("c0", lo, hi)
                                  for lo, hi in cluster_specs],
                termination_threshold=2.5),
            action_space=actions.SelectMove(scale=0.25),
            renderers={"success": renderers.Success()},
            init_sprites=FixedGenerator(f),
            max_episode_length=8)
        ref_env = _ref_env(
            f, k,
            ref_tasks.Clustering(
                cluster_distribs=[ref_fd.Continuous("c0", lo, hi)
                                  for lo, hi in cluster_specs],
                termination_threshold=2.5),
            ref_as.SelectMove(scale=0.25), 8)
        seq = []
        for t in range(12):
            if t % 2 == 0:
                src = f[rng.integers(0, k), :2] + rng.normal(0, 0.01, 2)
            else:
                src = rng.uniform(0, 1, 2)
            seq.append(np.clip(np.concatenate(
                [src, rng.uniform(0, 1, 2)]), 0, 1).astype(np.float32))
        # Davies-Bouldin in f32 vs sklearn f64: allow a looser reward tol.
        _run_parity(ours_env, ref_env, seq, k, reward_tol=5e-3,
                    label=f"clustering[{trial}]")


def test_sorting_meta_aggregated_trajectory_parity():
    """Sorting-style MetaAggregated(sum, all) of two FindGoalPosition
    subtasks (the cobra sorting task shape, configs/cobra/sorting.py)."""
    ref_tasks = ref_oracle.ref_module("tasks")
    ref_as = ref_oracle.ref_module("action_spaces")
    ref_fd = ref_oracle.ref_module("factor_distributions")
    rng = np.random.default_rng(14)
    for trial in range(3):
        k = 4
        hues = np.array([0.05, 0.1, 0.55, 0.6])
        f = _scene(rng, k, hues=hues)
        subspecs = [((0.0, 0.2), (0.2, 0.2)), ((0.5, 0.7), (0.8, 0.8))]

        def make(task_mod, fd_mod):
            subs = [task_mod.FindGoalPosition(
                filter_distrib=fd_mod.Continuous("c0", lo, hi),
                goal_position=goal, terminate_distance=0.15,
                raw_reward_multiplier=5)
                for (lo, hi), goal in subspecs]
            return task_mod.MetaAggregated(
                subs, reward_aggregator="sum", termination_criterion="all")

        ours_env = environment.Environment(
            task=make(tasks, distribs),
            action_space=actions.SelectMove(scale=0.25),
            renderers={"success": renderers.Success()},
            init_sprites=FixedGenerator(f),
            max_episode_length=8)
        ref_env = _ref_env(f, k, make(ref_tasks, ref_fd),
                           ref_as.SelectMove(scale=0.25), 8)
        seq = []
        for t in range(12):
            if t % 2 == 0:
                src = f[rng.integers(0, k), :2] + rng.normal(0, 0.01, 2)
            else:
                src = rng.uniform(0, 1, 2)
            seq.append(np.clip(np.concatenate(
                [src, rng.uniform(0, 1, 2)]), 0, 1).astype(np.float32))
        _run_parity(ours_env, ref_env, seq, k, label=f"sorting[{trial}]")


def test_image_observation_trajectory_parity():
    """Pixel-exact image observations along a SelectMove trajectory
    (anti_aliasing=1, XLA rasterizer vs live PILRenderer)."""
    ref_tasks = ref_oracle.ref_module("tasks")
    ref_as = ref_oracle.ref_module("action_spaces")
    ref_fd = ref_oracle.ref_module("factor_distributions")
    ref_renderers = ref_oracle.ref_module("renderers")
    rng = np.random.default_rng(15)
    k = 3
    f = _scene(rng, k)
    ours_env = environment.Environment(
        task=tasks.FindGoalPosition(
            filter_distrib=distribs.Continuous("c0", 0.0, 0.5),
            terminate_distance=0.1),
        action_space=actions.SelectMove(scale=0.25),
        renderers={"image": renderers.ImageRenderer(
            image_size=(64, 64), anti_aliasing=1, color_to_rgb="hsv",
            use_pallas=False)},
        init_sprites=FixedGenerator(f),
        max_episode_length=6)
    ref_env = _ref_env(
        f, k,
        ref_tasks.FindGoalPosition(
            filter_distrib=ref_fd.Continuous("c0", 0.0, 0.5),
            terminate_distance=0.1),
        ref_as.SelectMove(scale=0.25), 6,
        ref_renderers={"image": ref_renderers.PILRenderer(
            image_size=(64, 64), anti_aliasing=1,
            color_to_rgb=ref_renderers.color_maps.hsv_to_rgb)})
    seq = []
    for t in range(8):
        if t % 2 == 0:
            src = f[rng.integers(0, k), :2] + rng.normal(0, 0.01, 2)
        else:
            src = rng.uniform(0, 1, 2)
        seq.append(np.clip(np.concatenate(
            [src, rng.uniform(0, 1, 2)]), 0, 1).astype(np.float32))
    _run_parity(ours_env, ref_env, seq, k, label="image_traj",
                image_key="image")
