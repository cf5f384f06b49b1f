"""Scale-out layer tests on the virtual 8-device CPU mesh (conftest.py)."""

import importlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spriteworld_tpu.core import environment, renderers
from spriteworld_tpu.parallel import (
    Metrics, ShardedRunner, env_mesh, env_sharding, restore_state,
    save_state)


def make_env():
    config = importlib.import_module(
        "spriteworld_tpu.configs.cobra.goal_finding_new_shape"
    ).get_config("train")
    config["renderers"] = {"success": renderers.Success()}
    return environment.Environment(**config)


def test_mesh_uses_all_devices():
    mesh = env_mesh()
    assert mesh.size == 8  # conftest forces 8 virtual CPU devices
    assert mesh.axis_names == ("envs",)


def test_sharded_rollout_matches_unsharded():
    env = make_env()
    mesh = env_mesh()
    runner = ShardedRunner(env, num_envs=16, mesh=mesh)
    state, _ = runner.reset(jax.random.key(0))
    assert len(state.factors.sharding.device_set) == 8

    state, _, metrics = runner.rollout(state, jax.random.key(1), 25)

    # Replay the same rollout without any mesh: one-device vmap loop.
    benv = environment.BatchedEnvironment(env, 16)
    s2, _ = benv.reset(jax.random.key(0))
    key = jax.random.key(1)
    steps = episodes = successes = 0
    reward_sum = 0.0
    for _ in range(25):
        key, k_act = jax.random.split(key)
        acts = jax.vmap(env.sample_action)(jax.random.split(k_act, 16))
        s2, ts = benv.step(s2, acts)
        last = np.asarray(ts.step_type) == 2
        steps += 16
        episodes += last.sum()
        successes += (last & np.asarray(ts.observation["success"])).sum()
        reward_sum += np.nan_to_num(np.asarray(ts.reward)).sum()

    assert int(metrics.steps) == steps
    assert int(metrics.episodes) == episodes
    assert int(metrics.successes) == successes
    np.testing.assert_allclose(
        float(metrics.reward_sum), reward_sum, rtol=1e-4)


def test_rollout_chunks_accumulate():
    env = make_env()
    runner = ShardedRunner(env, num_envs=8)
    state, _ = runner.reset(jax.random.key(3))
    key = jax.random.key(4)
    total = Metrics.zero()
    for _ in range(3):
        state, key, m = runner.rollout(state, key, 10)
        total = total + m
    assert int(total.steps) == 3 * 10 * 8
    assert int(total.episodes) >= 0
    assert float(total.success_rate) <= 1.0


def test_rollout_with_timesteps_trace():
    env = make_env()
    runner = ShardedRunner(env, num_envs=8)
    state, _ = runner.reset(jax.random.key(0))
    state, key, metrics, tss = runner.rollout(
        state, jax.random.key(1), 5, return_timesteps=True)
    assert tss.step_type.shape == (5, 8)
    assert int(metrics.episodes) == int(
        (np.asarray(tss.step_type) == 2).sum())
    # Stacked observation leaves are flattened per lane ([T, B, -1] at
    # most): multi-dim leaves (images, factor slabs) would otherwise pay
    # the TPU minor-dim tile padding on every scan step (PERF_NOTES.md).
    for leaf in jax.tree.leaves(tss.observation):
        assert leaf.ndim <= 3, leaf.shape

    # timestep_obs restricts the stacked trace to the requested keys.
    state, key, metrics, tss2 = runner.rollout(
        state, jax.random.key(2), 5, return_timesteps=True,
        timestep_obs=("success",))
    assert set(tss2.observation) == {"success"}

    # Image observations come back flattened to [T, B, H*W*3].
    env_img = make_env()
    env_img._renderers["image"] = renderers.ImageRenderer((16, 16)).bind(
        env_img.max_sprites)
    r2 = ShardedRunner(env_img, num_envs=8)
    st, _ = r2.reset(jax.random.key(0))
    _, _, _, tss3 = r2.rollout(st, jax.random.key(1), 2,
                               return_timesteps=True)
    assert tss3.observation["image"].shape == (2, 8, 16 * 16 * 3)
    assert tss3.observation["image"].dtype == jnp.uint8


def test_checkpoint_roundtrip_resumes_trajectory(tmp_path):
    env = make_env()
    runner = ShardedRunner(env, num_envs=8)
    state, _ = runner.reset(jax.random.key(7))
    state, key, _ = runner.rollout(state, jax.random.key(8), 7)

    save_state(str(tmp_path / "ck"), state)
    restored = restore_state(str(tmp_path / "ck"), state)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(jax.random.key_data(a))
            if jax.dtypes.issubdtype(a.dtype, jax.dtypes.prng_key)
            else np.asarray(a),
            np.asarray(jax.random.key_data(b))
            if jax.dtypes.issubdtype(b.dtype, jax.dtypes.prng_key)
            else np.asarray(b)),
        state, restored)

    # Continuing from the restored state reproduces the same trajectory.
    k = jax.random.key(9)
    benv = environment.BatchedEnvironment(env, 8)
    acts = jax.vmap(env.sample_action)(jax.random.split(k, 8))
    s_a, ts_a = benv.step(state, acts)
    s_b, ts_b = benv.step(restored, acts)
    np.testing.assert_array_equal(
        np.asarray(ts_a.reward), np.asarray(ts_b.reward))
    np.testing.assert_array_equal(
        np.asarray(s_a.factors), np.asarray(s_b.factors))


def test_checkpoint_resume_preserves_inflight_episode_returns(tmp_path):
    """Kill-and-resume: per-episode return metrics must match an
    uninterrupted run, including episodes in flight at save time
    (VERDICT r2: ShardedRunner.rollout used to silently zero-fill)."""
    env = make_env()

    # Uninterrupted: 14 steps in two chunks on one runner.
    runner_a = ShardedRunner(env, num_envs=8)
    state, _ = runner_a.reset(jax.random.key(7))
    state, key, m1 = runner_a.rollout(state, jax.random.key(8), 7)
    state, key, m2 = runner_a.rollout(state, key, 7)
    want = m1 + m2

    # Interrupted: identical first chunk, checkpoint mid-episode (7 steps
    # into 20-step episodes), then a FRESH runner restores and continues.
    runner_b = ShardedRunner(env, num_envs=8)
    state_b, _ = runner_b.reset(jax.random.key(7))
    state_b, key_b, n1 = runner_b.rollout(state_b, jax.random.key(8), 7)
    ckpt = {"env_state": state_b, "key": key_b,
            "episode_returns": runner_b.episode_returns}
    save_state(str(tmp_path / "ck"), ckpt)
    del runner_b

    runner_c = ShardedRunner(env, num_envs=8)  # simulated restart
    restored = restore_state(str(tmp_path / "ck"), ckpt)
    state_c, key_c, n2 = runner_c.rollout(
        restored["env_state"], restored["key"], 7,
        episode_returns=restored["episode_returns"])
    got = n1 + n2

    assert int(got.steps) == int(want.steps)
    assert int(got.episodes) == int(want.episodes)
    assert int(got.successes) == int(want.successes)
    np.testing.assert_allclose(
        float(got.return_sum), float(want.return_sum), rtol=1e-5)
    np.testing.assert_allclose(
        float(got.reward_sum), float(want.reward_sum), rtol=1e-5)


def test_checkpoint_restore_fills_missing_fields(tmp_path):
    """A checkpoint predating a state field restores with the new field
    taken from `like` (default-fill migration), with a warning — instead
    of failing or silently misaligning leaves (ADVICE r2)."""
    old = {"a": jnp.arange(4.0), "key": jax.random.key(3)}
    save_state(str(tmp_path / "old"), old)
    like = {"a": jnp.zeros(4), "b": jnp.full((2,), 7, jnp.int32),
            "key": jax.random.key(0)}
    with pytest.warns(UserWarning, match="predates state field"):
        restored = restore_state(str(tmp_path / "old"), like)
    np.testing.assert_array_equal(np.asarray(restored["a"]),
                                  np.arange(4.0))
    np.testing.assert_array_equal(np.asarray(restored["b"]), [7, 7])
    np.testing.assert_array_equal(
        np.asarray(jax.random.key_data(restored["key"])),
        np.asarray(jax.random.key_data(old["key"])))


def test_num_envs_must_divide_mesh():
    env = make_env()
    with pytest.raises(ValueError):
        ShardedRunner(env, num_envs=9)


def test_initialize_multihost_wires_arguments(monkeypatch):
    """The DCN bring-up wrapper forwards its arguments to
    jax.distributed.initialize and is a no-op once initialized / in
    single-process environments."""
    from spriteworld_tpu.parallel import mesh as mesh_lib

    calls = []
    monkeypatch.setattr(
        jax.distributed, "initialize",
        lambda **kw: calls.append(kw))
    mesh_lib.initialize_multihost("10.0.0.1:8476", 4, 2)
    assert calls == [dict(coordinator_address="10.0.0.1:8476",
                          num_processes=4, process_id=2)]

    # Already-initialized: short-circuits before touching distributed.
    monkeypatch.setattr(jax.distributed, "is_initialized", lambda: True)
    mesh_lib.initialize_multihost()
    assert len(calls) == 1
    monkeypatch.setattr(jax.distributed, "is_initialized", lambda: False)

    # Auto-detection failure without explicit coordinator is swallowed
    # (tests/one-chip benches)...
    def boom(**kw):
        raise ValueError("requires multiple processes")
    monkeypatch.setattr(jax.distributed, "initialize", boom)
    mesh_lib.initialize_multihost()

    # ...but an explicit bring-up that fails must raise.
    with pytest.raises(ValueError):
        mesh_lib.initialize_multihost("10.0.0.1:8476", 2, 0)

    # (The REAL 2-process bring-up path is exercised end-to-end in
    # tests/test_distributed.py.)


def test_evaluate_per_episode_stats():
    """evaluate() recovers per-episode returns exactly: align the episode
    set with one on-device Metrics chunk and the aggregates must agree."""
    env = make_env()

    # Reference chunk: how many episodes finish in one 16-step chunk of
    # the identical stream evaluate() will run (same reset key, same
    # rollout key derivation), and their on-device return sum.
    ref = ShardedRunner(env, num_envs=8)
    state, _ = ref.reset(jax.random.key(0))
    key = jax.random.fold_in(jax.random.key(0), 1)
    _, _, m = ref.rollout(state, key, 48)
    assert m.episodes > 1

    runner = ShardedRunner(env, num_envs=8)
    stats = runner.evaluate(jax.random.key(0), num_episodes=m.episodes,
                            chunk_steps=48)
    assert stats.episodes == m.episodes
    # Same episode set -> the per-episode mean must match the on-device
    # sum (f32 on device vs f64 on host).
    assert stats.mean_return == pytest.approx(
        float(m.return_sum) / int(m.episodes), rel=1e-5)
    assert stats.std_return >= 0
    assert stats.ci95_return == pytest.approx(
        1.96 * stats.std_return / np.sqrt(m.episodes))
    assert 0.0 <= stats.success_rate <= 1.0

    # Larger targets span multiple chunks and still return exactly N.
    stats2 = runner.evaluate(jax.random.key(3), num_episodes=25,
                             chunk_steps=48)
    assert stats2.episodes == 25


def test_record_episode_and_save_gif(tmp_path):
    from spriteworld_tpu.utils import media

    env = make_env()
    env._renderers["image"] = renderers.ImageRenderer((16, 16)).bind(
        env.max_sprites)
    frames = media.record_episode(env, jax.random.key(2), max_steps=6)
    assert frames.dtype == np.uint8
    assert frames.ndim == 4 and frames.shape[-1] == 3
    assert 2 <= frames.shape[0] <= 7

    path = media.save_gif(frames, str(tmp_path / "ep.gif"), scale=2)
    from PIL import Image

    img = Image.open(path)
    # PIL merges identical consecutive frames (random clicks can miss the
    # sprite), so n_frames is a lower bound.
    assert 1 <= img.n_frames <= frames.shape[0]
    assert img.size == (32, 32)

    # Distinct synthetic frames round-trip with the full frame count.
    rng = np.random.default_rng(0)
    synth = rng.integers(0, 255, (5, 16, 16, 3)).astype(np.uint8)
    p2 = media.save_gif(synth, str(tmp_path / "synth.gif"))
    assert Image.open(p2).n_frames == 5


def test_evaluate_preserves_inflight_returns():
    """evaluate() must not clobber the caller's rollout stream: the
    in-flight episode-return accumulator is saved and restored."""
    env = make_env()
    runner = ShardedRunner(env, num_envs=8)
    state, _ = runner.reset(jax.random.key(5))
    state, key, _ = runner.rollout(state, jax.random.key(6), 7)
    before = np.asarray(runner.episode_returns).copy()
    assert np.abs(before).sum() > 0  # episodes genuinely mid-flight
    runner.evaluate(jax.random.key(7), num_episodes=5, chunk_steps=48)
    np.testing.assert_array_equal(before,
                                  np.asarray(runner.episode_returns))
