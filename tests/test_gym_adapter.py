"""Gym adapter tests — port of /root/reference/tests/gym_wrapper_test.py.

Covers spec->space conversion (Box for SelectMove, Tuple of Discretes for
Embodied), the (obs, reward, done, info) step tuple, done cadence across
auto-reset, the bool->float32 observation cast, and the render() image
cache. Runs against the real gym when installed, else against the vendored
stub (tests/_gym_stub.py) exercising identical adapter code paths.
"""

import numpy as np
import pytest

import _gym_stub

_gym_stub.install()

from gym import spaces  # noqa: E402

from spriteworld_tpu.adapters import dm_env_adapter, gym_adapter  # noqa: E402
from spriteworld_tpu.core import actions  # noqa: E402
from spriteworld_tpu.core import distributions as distribs  # noqa: E402
from spriteworld_tpu.core import generators, renderers, tasks  # noqa: E402

MAX_EPISODE_LENGTH = 5


def _make_env(action_space, extra_renderers=None, num_sprites=1):
    dist = distribs.Product([
        distribs.Continuous("x", 0.2, 0.8),
        distribs.Continuous("y", 0.2, 0.8),
        distribs.Discrete("shape", ["square"]),
        distribs.Discrete("scale", [0.2]),
        distribs.Discrete("c0", [255]),
    ])
    rend = {"image": renderers.ImageRenderer(image_size=(16, 16))}
    rend.update(extra_renderers or {})
    dm = dm_env_adapter.Environment(
        task=tasks.NoReward(),
        action_space=action_space,
        renderers=rend,
        init_sprites=generators.generate_sprites(dist, num_sprites),
        max_episode_length=MAX_EPISODE_LENGTH,
        seed=0)
    return gym_adapter.GymWrapper(dm)


def _run_episodes(env):
    """Reference episode choreography (gym_wrapper_test.py:59-72)."""
    for _ in range(3):
        env.reset()
        for _ in range(MAX_EPISODE_LENGTH - 1):
            action = env.action_space.sample()
            obs, reward, done, info = env.step(action)
            assert obs["image"].dtype == np.uint8
            assert not done
            assert reward == 0.0
            assert "discount" in info
        action = env.action_space.sample()
        _, _, done, _ = env.step(action)
        assert done
        # Step after LAST auto-resets: emits FIRST, not done (reference
        # environment.py:90-91 semantics preserved through the adapter).
        _, _, done, _ = env.step(action)
        assert not done


def test_continuous_actions():
    env = _make_env(actions.SelectMove())
    assert env.observation_space == spaces.Dict({
        "image": spaces.Box(-np.inf, np.inf, shape=(16, 16, 3),
                            dtype=np.uint8)})
    assert env.action_space == spaces.Box(
        0.0, 1.0, shape=(4,), dtype=np.float32)
    _run_episodes(env)


def test_embodied_actions():
    env = _make_env(actions.Embodied(), num_sprites=2)
    assert env.action_space == spaces.Tuple(
        [spaces.Discrete(2), spaces.Discrete(4)])
    _run_episodes(env)


def test_bool_obs_cast_and_factor_matrix():
    env = _make_env(actions.SelectMove(), extra_renderers={
        "success": renderers.Success(),
        "factors": renderers.SpriteFactors(("x", "y"))})
    obs = env.reset()
    # Success (bool) is cast to float32 (reference gym_wrapper.py:83-85).
    assert obs["success"].dtype == np.float32
    assert obs["success"] == 0.0
    # Per-sprite factor dicts become an [N, F] float matrix (:79-82).
    assert obs["factors"].shape == (1, 2)
    assert obs["factors"].dtype == np.float32


def test_render_returns_cached_image():
    env = _make_env(actions.SelectMove())
    obs = env.reset()
    img = env.render()
    np.testing.assert_array_equal(img, obs["image"])
    with pytest.raises(ValueError):
        env.render(mode="human")


def test_getattr_passthrough():
    env = _make_env(actions.SelectMove())
    # dm_env extras reachable through the wrapper (gym_wrapper.py:60-61).
    assert env.success() in (True, False)
