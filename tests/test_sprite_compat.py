"""Host-side Sprite compat object vs the live reference Sprite.

Pins the mutable-Sprite API the reference exposes (sprite.py:45-214),
including the deliberate scale-delta quirk its own tests bake in
(reference tests/sprite_test.py:138-174), and the SpritePassthrough
observation returning Sprite objects (handcrafted.py:85-112).
"""

import numpy as np
import pytest

from spriteworld_tpu import constants, sprite as sprite_lib

import ref_oracle


def _pair(seed=0, **overrides):
    rng = np.random.default_rng(seed)
    kwargs = dict(
        x=float(rng.uniform(0.2, 0.8)), y=float(rng.uniform(0.2, 0.8)),
        shape=str(rng.choice(constants.SHAPE_NAMES)),
        angle=float(rng.uniform(0, 360)), scale=float(rng.uniform(0.1, 0.3)),
        c0=10, c1=20, c2=30, x_vel=0.01, y_vel=-0.02)
    kwargs.update(overrides)
    ref_oracle._install_shims()
    ref = ref_oracle.ref_module("sprite").Sprite(**kwargs)
    ours = sprite_lib.Sprite(**kwargs)
    return ours, ref


@pytest.mark.parametrize("seed", range(5))
def test_vertices_match_reference(seed):
    ours, ref = _pair(seed)
    np.testing.assert_allclose(ours.vertices, ref.vertices, atol=1e-9)


@pytest.mark.parametrize("seed", range(5))
def test_contains_point_matches_reference(seed):
    ours, ref = _pair(seed)
    rng = np.random.default_rng(seed + 100)
    pts = rng.uniform(0, 1, (200, 2))
    got = [ours.contains_point(p) for p in pts]
    want = [bool(ref.contains_point(p)) for p in pts]
    assert got == want


def test_setters_match_reference_including_scale_quirk():
    ours, ref = _pair(3, shape="square", angle=0.0, scale=0.25)
    for s in (ours, ref):
        s.angle = 45
    np.testing.assert_allclose(ours.vertices, ref.vertices, atol=1e-9)
    for s in (ours, ref):
        s.scale = 0.5  # delta-quirk: shape SHRINKS (0.5 - 0.25 = 0.25)
    np.testing.assert_allclose(ours.vertices, ref.vertices, atol=1e-9)
    extent = ours.vertices.max(0) - ours.vertices.min(0)
    assert (extent < 0.3).all()  # smaller than a true 0.5-scale square
    for s in (ours, ref):
        s.shape = "triangle"  # full rebuild at current angle/scale
    np.testing.assert_allclose(ours.vertices, ref.vertices, atol=1e-9)


def test_motion_and_factors_roundtrip():
    ours, ref = _pair(4)
    for s in (ours, ref):
        s.move([0.5, 0.5], keep_in_frame=True)
        s.update_position(keep_in_frame=False)
    np.testing.assert_allclose(ours.position, ref.position)
    assert ours.out_of_frame == ref.out_of_frame
    got, want = ours.factors, ref.factors
    assert list(got) == list(want)
    for k in got:
        assert got[k] == want[k], k


def test_sample_contained_position_is_inside():
    ours, _ = _pair(6)
    np.random.seed(0)
    for _ in range(10):
        assert ours.contains_point(ours.sample_contained_position())


def test_passthrough_observation_returns_sprites():
    from spriteworld_tpu.adapters import dm_env_adapter
    from spriteworld_tpu.core import (actions, distributions as distribs,
                                      generators, renderers, tasks)

    dist = distribs.Product([
        distribs.Continuous("x", 0.2, 0.8),
        distribs.Continuous("y", 0.2, 0.8),
        distribs.Discrete("shape", ["pentagon"]),
        distribs.Discrete("scale", [0.2]),
    ])
    env = dm_env_adapter.Environment(
        task=tasks.NoReward(),
        action_space=actions.SelectMove(scale=0.25),
        renderers={"sprites": renderers.SpritePassthrough()},
        init_sprites=generators.generate_sprites(dist, 2),
        max_episode_length=5,
        seed=0)
    ts = env.reset()
    obs = ts.observation["sprites"]
    assert obs.dtype == object and obs.shape == (2,)
    assert all(isinstance(s, sprite_lib.Sprite) for s in obs)
    assert obs[0].shape == "pentagon"
    spec = env.observation_spec()["sprites"]
    assert spec.shape == (2,) and spec.dtype == object
    st = env.state(as_sprites=True)
    assert isinstance(st["sprites"][0], sprite_lib.Sprite)
