"""Environment core: dm_env cadence, auto-reset, trajectory parity."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spriteworld_tpu.core import actions
from spriteworld_tpu.core import distributions as distribs
from spriteworld_tpu.core import environment
from spriteworld_tpu.core import generators
from spriteworld_tpu.core import renderers
from spriteworld_tpu.core import state as state_lib
from spriteworld_tpu.core.state import StepType

import ref_oracle


class FixedGenerator(generators.SpriteGenerator):
    """Injects a fixed scene — the seeded-parity harness (SURVEY.md §7)."""

    def __init__(self, factors):
        self._factors = np.asarray(factors, np.float32)
        self.max_sprites = self._factors.shape[0]

    def sample(self, key):
        del key
        return jnp.asarray(self._factors), jnp.int32(self.max_sprites)


def _scene(rng, k):
    f = np.tile(state_lib.DEFAULT_FACTORS, (k, 1)).astype(np.float32)
    f[:, state_lib.X] = rng.uniform(0.2, 0.8, k)
    f[:, state_lib.Y] = rng.uniform(0.2, 0.8, k)
    f[:, state_lib.SHAPE] = rng.integers(1, 7, k)
    f[:, state_lib.SCALE] = 0.2
    f[:, state_lib.C0] = rng.uniform(0, 1, k)
    return f


def _make_env(factors, task=None, max_episode_length=5, **kwargs):
    from spriteworld_tpu.core import tasks

    return environment.Environment(
        task=task or tasks.NoReward(),
        action_space=actions.SelectMove(scale=0.25),
        renderers={"factors": renderers.SpriteFactors(),
                   "success": renderers.Success()},
        init_sprites=FixedGenerator(factors),
        max_episode_length=max_episode_length,
        **kwargs)


def test_episode_cadence():
    """FIRST, MID x (L-1), LAST, then auto-reset FIRST."""
    env = _make_env(_scene(np.random.default_rng(0), 2),
                    max_episode_length=3)
    step = jax.jit(env.step)
    state, ts = jax.jit(env.reset)(jax.random.key(0))
    assert int(ts.step_type) == StepType.FIRST
    action = jnp.asarray([0.95, 0.95, 0.5, 0.5], jnp.float32)  # no-op click
    seen = []
    for _ in range(7):
        state, ts = step(state, action)
        seen.append(int(ts.step_type))
    assert seen == [StepType.MID, StepType.MID, StepType.LAST,
                    StepType.FIRST, StepType.MID, StepType.MID,
                    StepType.LAST]


def test_first_step_before_reset_resets():
    """Reference quirk: step() on a fresh env performs a reset
    (environment.py:70,90-91; pinned by tests/environment_test.py:78-79)."""
    env = _make_env(_scene(np.random.default_rng(1), 2))
    state = env.initial_state(jax.random.key(0))
    state, ts = jax.jit(env.step)(
        state, jnp.asarray([0.5, 0.5, 0.9, 0.9], jnp.float32))
    assert int(ts.step_type) == StepType.FIRST
    assert float(ts.reward) == 0.0


def test_out_of_frame_terminates():
    f = _scene(np.random.default_rng(2), 1)
    f[0, state_lib.X] = 0.98
    f[0, state_lib.X + 8] = 0.0  # no velocity
    env = _make_env(f, keep_in_frame=False, max_episode_length=50)
    state, ts = jax.jit(env.reset)(jax.random.key(0))
    step = jax.jit(env.step)
    # Push the sprite right repeatedly until its center exits the frame.
    action = jnp.asarray([0.98, float(f[0, 1]), 1.0, 0.5], jnp.float32)
    for i in range(10):
        state, ts = step(state, action)
        if int(ts.step_type) == StepType.LAST:
            break
    assert int(ts.step_type) == StepType.LAST
    assert float(ts.discount) == 0.0


def test_velocity_integration():
    f = _scene(np.random.default_rng(3), 1)
    f[0, state_lib.X] = 0.5
    f[0, state_lib.Y] = 0.5
    f[0, state_lib.X_VEL] = 0.01
    f[0, state_lib.Y_VEL] = -0.02
    env = _make_env(f, max_episode_length=50)
    state, _ = jax.jit(env.reset)(jax.random.key(0))
    action = jnp.asarray([0.99, 0.01, 0.5, 0.5], jnp.float32)  # miss
    state, _ = jax.jit(env.step)(state, action)
    np.testing.assert_allclose(
        np.asarray(state.factors[0, :2]), [0.51, 0.48], atol=1e-6)


def test_success_termination_and_parity_trajectory():
    """Same scene + same actions through both engines: rewards, step types,
    and positions must match step for step."""
    ref_env_mod = ref_oracle.ref_module("environment")
    ref_tasks = ref_oracle.ref_module("tasks")
    ref_as = ref_oracle.ref_module("action_spaces")
    ref_fd = ref_oracle.ref_module("factor_distributions")
    from spriteworld_tpu.core import tasks

    rng = np.random.default_rng(7)
    for trial in range(3):
        k = 3
        f = _scene(rng, k)
        ours_env = environment.Environment(
            task=tasks.FindGoalPosition(
                filter_distrib=distribs.Continuous("c0", 0.0, 0.5),
                terminate_distance=0.075),
            action_space=actions.SelectMove(scale=0.25),
            renderers={"success": renderers.Success()},
            init_sprites=FixedGenerator(f),
            max_episode_length=10)
        # Rebuild pristine sprites on every reset, mirroring FixedGenerator
        # (the reference mutates sprites in place during an episode).
        def fresh_sprites(f=f, k=k):
            return [ref_oracle.make_ref_sprite(f[i]) for i in range(k)]

        ref_env = ref_env_mod.Environment(
            task=ref_tasks.FindGoalPosition(
                filter_distrib=ref_fd.Continuous("c0", 0.0, 0.5),
                terminate_distance=0.075),
            action_space=ref_as.SelectMove(scale=0.25),
            renderers={},
            init_sprites=fresh_sprites,
            max_episode_length=10)

        state, ts = jax.jit(ours_env.reset)(jax.random.key(0))
        ref_ts = ref_env.reset()
        step = jax.jit(ours_env.step)

        for t in range(12):
            action = rng.uniform(0, 1, 4).astype(np.float32)
            state, ts = step(state, jnp.asarray(action))
            ref_ts = ref_env.step(action.astype(np.float64))
            # After a LAST, the reference resets to the SAME injected scene;
            # ours does too (FixedGenerator), so streams stay aligned.
            assert int(ts.step_type) == int(ref_ts.step_type), \
                f"trial {trial} t {t}"
            if ref_ts.reward is not None:
                ours_r = float(ts.reward)
                if np.isnan(ref_ts.reward):
                    assert np.isnan(ours_r)
                else:
                    assert ours_r == pytest.approx(ref_ts.reward, abs=2e-4)
            ref_pos = np.array([s.position for s in ref_env._sprites])
            np.testing.assert_allclose(
                np.asarray(state.factors[:k, :2]), ref_pos, atol=1e-5)


def test_batched_env_runs_and_auto_resets():
    from spriteworld_tpu.core import tasks

    env = _make_env(_scene(np.random.default_rng(4), 3),
                    max_episode_length=4)
    benv = environment.BatchedEnvironment(env, 16)
    state, ts = benv.reset(jax.random.key(0))
    assert ts.step_type.shape == (16,)
    for i in range(9):
        acts = benv.sample_actions(jax.random.key(i))
        state, ts = benv.step(state, acts)
    # After 9 steps with length-4 episodes: 4 MID/LAST cycles + reset FIRSTs
    st = np.asarray(ts.step_type)
    assert set(st.tolist()).issubset({0, 1, 2})


def test_observation_spec_matches_observation():
    env = _make_env(_scene(np.random.default_rng(5), 2))
    spec = env.observation_spec()
    _, ts = jax.jit(env.reset)(jax.random.key(0))
    obs = ts.observation
    assert spec["factors"]["factors"].shape \
        == obs["factors"]["factors"].shape
    assert spec["success"].shape == ()
    assert obs["success"].dtype == jnp.bool_
