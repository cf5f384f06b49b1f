"""Adapters: dm_env conformance + reference-shaped observations."""

import jax
import numpy as np
import pytest

from spriteworld_tpu.adapters import dm_env_adapter
from spriteworld_tpu.core import actions
from spriteworld_tpu.core import distributions as distribs
from spriteworld_tpu.core import generators
from spriteworld_tpu.core import renderers
from spriteworld_tpu.core import tasks


def _make_dm_env(max_episode_length=5, extra_renderers=None,
                 no_default_renderers=False):
    dist = distribs.Product([
        distribs.Continuous("x", 0.1, 0.9),
        distribs.Continuous("y", 0.1, 0.9),
        distribs.Discrete("shape", ["square", "triangle"]),
        distribs.Discrete("scale", [0.2]),
        distribs.Continuous("c0", 0.0, 1.0),
    ])
    rend = {} if no_default_renderers else {
        "factors": renderers.SpriteFactors(),
        "success": renderers.Success()}
    rend.update(extra_renderers or {})
    return dm_env_adapter.Environment(
        task=tasks.NoReward(),
        action_space=actions.SelectMove(scale=0.25),
        renderers=rend,
        init_sprites=generators.generate_sprites(dist, 2),
        max_episode_length=max_episode_length,
        metadata={"name": "test"},
        seed=0)


def test_dm_env_conformance():
    """Run dm_env's own protocol conformance suite against the adapter.

    The reference does the same (tests/environment_test.py:34-51), with the
    same two tweaks: empty renderers for speed, and an overridden
    observation validator (its SpriteFactors obs is a list of dicts, which
    dm_env's default nest check cannot compare against the spec).
    """
    from dm_env import test_utils
    import unittest

    class Conformance(test_utils.EnvironmentTestMixin, unittest.TestCase):
        def make_object_under_test(inner_self):
            return _make_dm_env(no_default_renderers=True)

        def assertValidObservation(inner_self, observation):
            spec = inner_self.environment.observation_spec()
            for k, v in observation.items():
                inner_self.assertConformsToSpec(v, spec[k])

        def make_action_sequence(inner_self):
            rng = np.random.default_rng(0)
            for _ in range(8):
                yield rng.uniform(0, 1, 4).astype(np.float32)

    suite = unittest.defaultTestLoader.loadTestsFromTestCase(Conformance)
    result = unittest.TextTestRunner(verbosity=0).run(suite)
    assert result.wasSuccessful(), result.failures + result.errors


def test_factors_observation_is_list_of_dicts():
    env = _make_dm_env()
    ts = env.reset()
    obs = ts.observation["factors"]
    assert len(obs) == 2
    assert set(obs[0].keys()) == set(
        ("x", "y", "shape", "angle", "scale", "c0", "c1", "c2",
         "x_vel", "y_vel"))
    assert isinstance(obs[0]["x"], float)
    assert obs[0]["shape"] in (1.0, 2.0)
    assert isinstance(ts.observation["success"], bool)


def test_episode_loop_reference_style():
    """The reference example_run_loop pattern works unchanged."""
    env = _make_dm_env(max_episode_length=4)
    rng = np.random.default_rng(1)
    for _ in range(2):
        ts = env.reset()
        assert ts.first()
        steps = 0
        while not ts.last():
            ts = env.step(rng.uniform(0, 1, 4))
            steps += 1
            assert steps <= 5
        assert steps == 4


def test_state_and_helpers():
    env = _make_dm_env()
    env.reset()
    st = env.state()
    assert st["sprites"].shape == (2, 10)
    assert st["global_state"]["metadata"] == {"name": "test"}
    assert isinstance(env.success(), bool)
    assert isinstance(env.should_terminate(), bool)
    p = env.sample_contained_position()
    assert p.shape == (2,)
    assert env.action_space is not None


def test_image_observation():
    env = _make_dm_env(extra_renderers={
        "image": renderers.ImageRenderer(
            (32, 32), anti_aliasing=1, color_to_rgb="hsv",
            use_pallas=False)})
    ts = env.reset()
    img = ts.observation["image"]
    assert img.shape == (32, 32, 3) and img.dtype == np.uint8
    spec = env.observation_spec()
    assert spec["image"].shape == (32, 32, 3)


def test_embodied_action_adapter():
    dist = distribs.Product([
        distribs.Continuous("x", 0.1, 0.9),
        distribs.Continuous("y", 0.1, 0.9),
        distribs.Discrete("scale", [0.15]),
    ])
    env = dm_env_adapter.Environment(
        task=tasks.NoReward(),
        action_space=actions.Embodied(step_size=0.05),
        renderers={"factors": renderers.SpriteFactors()},
        init_sprites=generators.generate_sprites(dist, 3),
        max_episode_length=5,
        seed=0)
    env.reset()
    ts = env.step([1, 2])
    assert ts.mid()
    spec = env.action_spec()
    assert isinstance(spec, list) and len(spec) == 2


def test_impossible_distribution_raises_host_side():
    """The engine flags exhausted rejection sampling (EnvState.sample_ok)
    and the dm_env adapter re-raises it, mirroring the reference's
    ValueError (factor_distributions.py:248-249)."""
    impossible = distribs.Product([
        distribs.SetMinus(distribs.Continuous("x", 0.1, 0.9),
                          distribs.Continuous("x", 0.0, 1.0)),
        distribs.Continuous("y", 0.1, 0.9),
    ])
    env = dm_env_adapter.Environment(
        task=tasks.NoReward(),
        action_space=actions.SelectMove(scale=0.25),
        renderers={},
        init_sprites=generators.generate_sprites(impossible, 1),
        max_episode_length=5,
        seed=0)
    with pytest.raises(ValueError, match="Maximum number of tries"):
        env.reset()


def test_degenerate_clustering_raises_host_side():
    """A Clustering task whose scene populates <2 clusters is flagged
    (EnvState.task_valid) and raised host-side by the adapter, mirroring
    the sklearn ValueError the reference propagates (tasks.py:207-215) —
    instead of silently emitting NaN rewards."""
    # All sprites have hue in [0.0, 0.2): only the first cluster populates.
    scene = distribs.Product([
        distribs.Continuous("x", 0.1, 0.9),
        distribs.Continuous("y", 0.1, 0.9),
        distribs.Continuous("c0", 0.0, 0.2),
    ])
    clustering_task = tasks.Clustering(
        cluster_distribs=[distribs.Continuous("c0", 0.0, 0.2),
                          distribs.Continuous("c0", 0.5, 0.7)],
        termination_threshold=2.5)
    env = dm_env_adapter.Environment(
        task=clustering_task,
        action_space=actions.SelectMove(scale=0.25),
        renderers={},
        init_sprites=generators.generate_sprites(scene, 4),
        max_episode_length=5,
        seed=0)
    with pytest.raises(ValueError, match="Davies-Bouldin metric does not"):
        env.reset()


def test_all_singleton_clustering_raises_host_side():
    """2 sprites in 2 clusters: n_labels == n_samples, the upper edge of
    sklearn's `1 < n_labels < n_samples` domain. The reference raises
    (tasks.py:207-215 -> sklearn check_number_of_labels); the engine's raw
    metric would degenerate to 1/(db=0) = inf, so task_valid must flag it
    and the adapter must raise exactly where the reference does."""
    from sklearn import metrics

    # The reference's sklearn call on the same state raises:
    with pytest.raises(ValueError, match="Number of labels"):
        metrics.davies_bouldin_score(
            np.array([[0.2, 0.2], [0.8, 0.8]]), np.array([0, 1]))

    # One sprite per cluster, deterministically (chain of 1-sprite gens).
    def one_sprite(c0_lo, c0_hi):
        return generators.generate_sprites(distribs.Product([
            distribs.Continuous("x", 0.1, 0.9),
            distribs.Continuous("y", 0.1, 0.9),
            distribs.Continuous("c0", c0_lo, c0_hi),
        ]), 1)

    clustering_task = tasks.Clustering(
        cluster_distribs=[distribs.Continuous("c0", 0.0, 0.2),
                          distribs.Continuous("c0", 0.5, 0.7)],
        termination_threshold=2.5)
    env = dm_env_adapter.Environment(
        task=clustering_task,
        action_space=actions.SelectMove(scale=0.25),
        renderers={},
        init_sprites=generators.ChainGenerators(
            one_sprite(0.0, 0.2), one_sprite(0.5, 0.7)),
        max_episode_length=5,
        seed=0)
    with pytest.raises(ValueError, match="Davies-Bouldin metric does not"):
        env.reset()


def test_degenerate_clustering_flags_batched_state():
    """The batched engine must NOT raise — it flags task_valid=False per
    lane and keeps the (NaN) rewards flowing for masked consumers."""
    from spriteworld_tpu.core import environment as env_lib

    scene = distribs.Product([
        distribs.Continuous("x", 0.1, 0.9),
        distribs.Continuous("y", 0.1, 0.9),
        distribs.Continuous("c0", 0.0, 0.2),
    ])
    clustering_task = tasks.Clustering(
        cluster_distribs=[distribs.Continuous("c0", 0.0, 0.2),
                          distribs.Continuous("c0", 0.5, 0.7)],
        termination_threshold=2.5)
    env = env_lib.Environment(
        task=clustering_task,
        action_space=actions.SelectMove(scale=0.25),
        renderers={"factors": renderers.SpriteFactors()},
        init_sprites=generators.generate_sprites(scene, 4),
        max_episode_length=5)
    benv = env_lib.BatchedEnvironment(env, 4)
    state, _ = benv.reset(jax.random.key(0))
    assert not np.asarray(state.task_valid).any()
    state, ts = benv.step(state, benv.sample_actions(jax.random.key(1)))
    assert not np.asarray(state.task_valid).any()
    assert np.isnan(np.asarray(ts.reward)).all()


def test_valid_clustering_state_passes():
    """A properly 2-cluster scene keeps task_valid True end to end."""
    scene = distribs.Product([
        distribs.Continuous("x", 0.1, 0.9),
        distribs.Continuous("y", 0.1, 0.9),
        distribs.Discrete("c0", [0.1, 0.6]),  # both clusters populated...
    ])
    clustering_task = tasks.Clustering(
        cluster_distribs=[distribs.Continuous("c0", 0.0, 0.2),
                          distribs.Continuous("c0", 0.5, 0.7)],
        termination_threshold=2.5)
    env = dm_env_adapter.Environment(
        task=clustering_task,
        action_space=actions.SelectMove(scale=0.25),
        renderers={},
        init_sprites=generators.generate_sprites(scene, 8),
        max_episode_length=5,
        seed=0)  # ...with 8 iid draws whp; seed pinned so it's deterministic
    ts = env.reset()
    ts = env.step([0.5, 0.5, 0.5, 0.5])
    assert np.isfinite(ts.reward)


@pytest.mark.parametrize("space_ctor", [
    lambda: actions.SelectMove(scale=0.25),
    lambda: actions.DragAndDrop(scale=0.5),
    lambda: actions.Embodied(step_size=0.05),
], ids=["select_move", "drag_and_drop", "embodied"])
def test_action_space_samples_validate_against_spec(space_ctor):
    """Adapter-level spec/value dtype agreement (VERDICT r2 weak #6): for
    every action space, `env.action_space.sample()` must validate against
    `action_spec()` exactly as dm_env would — including the Embodied
    list-spec's int64 scalars (reference action_spaces.py:161-164) — and
    must be accepted by env.step()."""
    dist = distribs.Product([
        distribs.Continuous("x", 0.1, 0.9),
        distribs.Continuous("y", 0.1, 0.9),
        distribs.Discrete("scale", [0.15]),
    ])
    env = dm_env_adapter.Environment(
        task=tasks.NoReward(),
        action_space=space_ctor(),
        renderers={"factors": renderers.SpriteFactors()},
        init_sprites=generators.generate_sprites(dist, 2),
        max_episode_length=5,
        seed=0)
    env.reset()
    spec = env.action_spec()
    for _ in range(5):
        action = env.action_space.sample()
        if isinstance(spec, list):
            assert isinstance(action, list) and len(action) == len(spec)
            for s, v in zip(spec, action):
                s.validate(v)  # dtype-strict
        else:
            spec.validate(action)
        ts = env.step(action)
        assert ts.step_type is not None


def test_adapter_public_surface_matches_reference():
    """Symbol-by-symbol walk of the reference Environment's public
    interface (SURVEY §1 L4; reference environment.py:74-161): every name a
    reference user can call must exist and be callable here."""
    env = _make_dm_env()
    for name in ("reset", "step", "observation", "observation_spec",
                 "action_spec", "state", "success", "should_terminate",
                 "sample_contained_position"):
        assert callable(getattr(env, name)), name
    assert env.action_space is not None  # property, not callable


def test_observation_renders_current_state_off_cycle():
    """`observation()` re-renders the CURRENT state on demand, like the
    reference (environment.py:136-142) — reference scripts poll it between
    steps and after state changes."""
    env = _make_dm_env(extra_renderers={
        "image": renderers.ImageRenderer(
            (32, 32), anti_aliasing=1, color_to_rgb="hsv",
            use_pallas=False)})
    ts = env.reset()
    obs = env.observation()
    assert set(obs.keys()) == set(ts.observation.keys())
    np.testing.assert_array_equal(obs["image"], ts.observation["image"])
    assert obs["factors"][0] == ts.observation["factors"][0]
    # Step, then poll again: observation() must track the new state.
    ts2 = env.step(np.array([0.1, 0.1, 0.9, 0.9], np.float32))
    obs2 = env.observation()
    np.testing.assert_array_equal(obs2["image"], ts2.observation["image"])
    # Repeated polling is idempotent (no hidden state advance).
    obs3 = env.observation()
    np.testing.assert_array_equal(obs3["image"], obs2["image"])


def test_action_space_property_is_stable_and_seeded():
    """The reference `action_space` property returns the same object on
    every access (environment.py:159-161). Two accesses here must yield ONE
    object (so successive .sample() calls draw one continuous stream), the
    stream must be reproducible across same-seeded envs, and sampling must
    not perturb the env's episode key."""
    env = _make_dm_env()
    assert env.action_space is env.action_space  # one cached object

    # Same-seeded envs sample identical action streams.
    env_b = _make_dm_env()
    s_a = [env.action_space.sample() for _ in range(3)]
    s_b = [env_b.action_space.sample() for _ in range(3)]
    for a, b in zip(s_a, s_b):
        np.testing.assert_array_equal(a, b)
    # The stream advances (it is one rng, not a fresh rng per access).
    assert not np.array_equal(s_a[0], s_a[1])

    # Sampling actions leaves the episode stream untouched: an env that
    # sampled 100 actions resets identically to one that sampled none.
    env_c = _make_dm_env()
    for _ in range(100):
        env_c.action_space.sample()
    obs_polluted = env_c.reset().observation["factors"]
    obs_clean = _make_dm_env().reset().observation["factors"]
    assert list(obs_polluted) == list(obs_clean)
