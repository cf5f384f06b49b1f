"""Task parity: rewards/success vs the live reference (incl. sklearn DB)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spriteworld_tpu.core import distributions as distribs
from spriteworld_tpu.core import state as state_lib
from spriteworld_tpu.core import tasks
from spriteworld_tpu.ops import clustering as clustering_ops

import ref_oracle


def _scene(rng, k, kmax=None):
    kmax = kmax or k
    f = np.tile(state_lib.DEFAULT_FACTORS, (kmax, 1)).astype(np.float32)
    f[:k, state_lib.X] = rng.uniform(0.05, 0.95, k)
    f[:k, state_lib.Y] = rng.uniform(0.05, 0.95, k)
    f[:k, state_lib.SHAPE] = rng.integers(1, 13, k)
    f[:k, state_lib.C0] = rng.uniform(0, 1, k)
    f[:k, state_lib.C1] = rng.uniform(0, 1, k)
    f[:k, state_lib.C2] = rng.uniform(0, 1, k)
    return f


def _ref_sprites(factors, n):
    return [ref_oracle.make_ref_sprite(factors[i]) for i in range(n)]


def _assert_reward_parity(ours, theirs, factors, n, atol=1e-4):
    sprites = _ref_sprites(factors, n)
    got_r = float(ours.reward(jnp.asarray(factors), jnp.int32(n)))
    got_s = bool(ours.success(jnp.asarray(factors), jnp.int32(n)))
    want_r = theirs.reward(sprites)
    want_s = bool(theirs.success(sprites))
    if np.isnan(want_r):
        assert np.isnan(got_r)
    else:
        assert got_r == pytest.approx(want_r, abs=atol), (got_r, want_r)
    assert got_s == want_s


def test_no_reward():
    t = tasks.NoReward()
    f = _scene(np.random.default_rng(0), 3)
    assert float(t.reward(jnp.asarray(f), jnp.int32(3))) == 0.0
    assert not bool(t.success(jnp.asarray(f), jnp.int32(3)))


@pytest.mark.parametrize("kwargs", [
    dict(),
    dict(goal_position=(0.2, 0.8), terminate_distance=0.3),
    dict(terminate_bonus=5.0, terminate_distance=0.8),
    dict(weights_dimensions=(1, 0)),
    dict(sparse_reward=True, terminate_distance=0.6),
    dict(raw_reward_multiplier=20),
])
def test_find_goal_position_parity(kwargs):
    ref_tasks = ref_oracle.ref_module("tasks")
    ours = tasks.FindGoalPosition(**kwargs)
    theirs = ref_tasks.FindGoalPosition(**kwargs)
    rng = np.random.default_rng(5)
    for _ in range(10):
        k = int(rng.integers(1, 6))
        f = _scene(rng, k, kmax=6)
        _assert_reward_parity(ours, theirs, f, k)


def test_find_goal_position_filtered_parity():
    ref_tasks = ref_oracle.ref_module("tasks")
    ref_fd = ref_oracle.ref_module("factor_distributions")
    ours = tasks.FindGoalPosition(
        filter_distrib=distribs.Continuous("c0", 0.0, 0.4),
        terminate_distance=0.075)
    theirs = ref_tasks.FindGoalPosition(
        filter_distrib=ref_fd.Continuous("c0", 0.0, 0.4),
        terminate_distance=0.075)
    rng = np.random.default_rng(6)
    for _ in range(10):
        k = int(rng.integers(1, 6))
        f = _scene(rng, k, kmax=6)
        _assert_reward_parity(ours, theirs, f, k)


def test_find_goal_nan_when_filter_empty():
    ours = tasks.FindGoalPosition(
        filter_distrib=distribs.Continuous("c0", 10.0, 11.0))
    f = _scene(np.random.default_rng(1), 3)
    assert np.isnan(float(ours.reward(jnp.asarray(f), jnp.int32(3))))
    # Vacuous success (reference `all([])` semantics)
    assert bool(ours.success(jnp.asarray(f), jnp.int32(3)))


def test_davies_bouldin_matches_sklearn():
    from sklearn import metrics

    rng = np.random.default_rng(2)
    for trial in range(20):
        n, c = int(rng.integers(4, 12)), int(rng.integers(2, 4))
        pos = rng.uniform(0, 1, (n, 2)).astype(np.float32)
        labels = rng.integers(0, c, n)
        # ensure at least 2 distinct labels
        labels[0], labels[1] = 0, 1
        member = np.zeros((n, c), bool)
        member[np.arange(n), labels] = True
        ours = float(clustering_ops.davies_bouldin_index(
            jnp.asarray(pos), jnp.asarray(member)))
        want = metrics.davies_bouldin_score(pos, labels)
        assert ours == pytest.approx(want, rel=1e-4), f"trial {trial}"


def test_davies_bouldin_absent_cluster_matches_sklearn():
    from sklearn import metrics

    rng = np.random.default_rng(3)
    pos = rng.uniform(0, 1, (8, 2)).astype(np.float32)
    labels = np.array([0, 0, 2, 2, 2, 0, 2, 0])  # cluster 1 absent
    member = np.zeros((8, 3), bool)
    member[np.arange(8), labels] = True
    ours = float(clustering_ops.davies_bouldin_index(
        jnp.asarray(pos), jnp.asarray(member)))
    want = metrics.davies_bouldin_score(pos, labels)
    assert ours == pytest.approx(want, rel=1e-4)


def test_davies_bouldin_single_cluster_is_nan():
    member = np.zeros((4, 2), bool)
    member[:, 0] = True
    out = float(clustering_ops.davies_bouldin_index(
        jnp.asarray(np.random.rand(4, 2).astype(np.float32)),
        jnp.asarray(member)))
    assert np.isnan(out)


def test_clustering_task_parity():
    ref_tasks = ref_oracle.ref_module("tasks")
    ref_fd = ref_oracle.ref_module("factor_distributions")
    cluster_defs = [(0.55, 0.65), (0.27, 0.37)]
    ours = tasks.Clustering(
        [distribs.Continuous("c0", lo, hi) for lo, hi in cluster_defs],
        terminate_bonus=0.0, reward_range=10.0)
    theirs = ref_tasks.Clustering(
        [ref_fd.Continuous("c0", lo, hi) for lo, hi in cluster_defs],
        terminate_bonus=0.0, reward_range=10.0)
    rng = np.random.default_rng(8)
    for trial in range(10):
        k = 4
        f = _scene(rng, k, kmax=6)
        # Put two sprites in each cluster's hue range
        f[:2, state_lib.C0] = rng.uniform(0.55, 0.65, 2)
        f[2:4, state_lib.C0] = rng.uniform(0.27, 0.37, 2)
        _assert_reward_parity(ours, theirs, f, k, atol=1e-3)


def test_meta_aggregated_parity():
    ref_tasks = ref_oracle.ref_module("tasks")
    ref_fd = ref_oracle.ref_module("factor_distributions")

    def build(task_mod, fd_mod):
        subtasks = [
            task_mod.FindGoalPosition(
                filter_distrib=fd_mod.Continuous("c0", 0.0, 0.3),
                goal_position=(0.25, 0.25), terminate_distance=0.075,
                raw_reward_multiplier=20),
            task_mod.FindGoalPosition(
                filter_distrib=fd_mod.Continuous("c0", 0.5, 0.8),
                goal_position=(0.75, 0.75), terminate_distance=0.075,
                raw_reward_multiplier=20),
        ]
        return subtasks

    rng = np.random.default_rng(9)
    for agg in ("sum", "max", "min", "mean"):
        for crit in ("all", "any"):
            ours = tasks.MetaAggregated(
                build(tasks, distribs), reward_aggregator=agg,
                termination_criterion=crit, terminate_bonus=1.0)
            theirs = ref_tasks.MetaAggregated(
                build(ref_tasks, ref_fd), reward_aggregator=agg,
                termination_criterion=crit, terminate_bonus=1.0)
            for _ in range(4):
                k = int(rng.integers(1, 5))
                f = _scene(rng, k, kmax=5)
                _assert_reward_parity(ours, theirs, f, k)


def test_meta_aggregated_validation():
    with pytest.raises(ValueError):
        tasks.MetaAggregated([tasks.NoReward()], reward_aggregator="bogus")
    with pytest.raises(ValueError):
        tasks.MetaAggregated([tasks.NoReward()],
                             termination_criterion="bogus")


def test_davies_bouldin_validity_domain_fuzz_vs_sklearn():
    """Fuzz degenerate memberships: the engine's validity predicate
    (n_labels >= 2) & (n_labels < n_samples) — what Clustering.valid
    computes — must accept EXACTLY the states sklearn's
    davies_bouldin_score accepts (check_number_of_labels:
    1 < n_labels < n_samples), and match its value wherever both are
    defined. Covers unassigned points, absent clusters, all-singleton
    clusters, and the single-cluster case."""
    from sklearn import metrics

    rng = np.random.default_rng(7)
    tried_raise = tried_value = 0
    for trial in range(60):
        n = int(rng.integers(2, 9))
        c = int(rng.integers(1, 5))
        pos = rng.uniform(0, 1, (n, 2)).astype(np.float32)
        # -1 = unassigned (reference drops those rows, tasks.py:210-213).
        labels = rng.integers(-1, c, n)
        if trial % 3 == 0:  # force the all-singleton edge to appear often
            labels = np.arange(n) % c
            rng.shuffle(labels)
            labels = labels[:n]
        member = np.zeros((n, c), bool)
        assigned = labels >= 0
        member[np.arange(n)[assigned], labels[assigned]] = True

        n_labels = int(member.any(axis=0).sum())
        n_samples = int(member.sum())
        ours_valid = (n_labels >= 2) and (n_labels < n_samples)

        try:
            want = metrics.davies_bouldin_score(
                pos[assigned], labels[assigned]) if n_samples else None
            sk_valid = n_samples > 0
        except ValueError:
            want, sk_valid = None, False
        assert ours_valid == sk_valid, (
            f"trial {trial}: valid mismatch labels={labels}")
        tried_raise += not sk_valid
        if sk_valid:
            tried_value += 1
            ours = float(clustering_ops.davies_bouldin_index(
                jnp.asarray(pos), jnp.asarray(member)))
            assert 1.0 / ours == pytest.approx(1.0 / want, rel=1e-4) \
                or ours == pytest.approx(want, rel=1e-4), f"trial {trial}"
    # The fuzz must actually exercise both sides of the domain boundary.
    assert tried_raise >= 10 and tried_value >= 10


def test_clustering_valid_rejects_all_singletons():
    """Task-level: 2 sprites, one per cluster -> valid() False (sklearn
    raises at n_labels == n_samples); 3 sprites with a 2-member cluster ->
    valid() True."""
    c0 = np.array([0.1, 0.6, 0.1], np.float32)
    f = np.zeros((3, 10), np.float32)
    f[:, 0] = [0.2, 0.8, 0.4]  # x
    f[:, 1] = [0.2, 0.8, 0.6]  # y
    f[:, 5] = c0
    task = tasks.Clustering(
        cluster_distribs=[distribs.Continuous("c0", 0.0, 0.2),
                          distribs.Continuous("c0", 0.5, 0.7)])
    assert not bool(task.valid(jnp.asarray(f), jnp.int32(2)))  # singletons
    assert bool(task.valid(jnp.asarray(f), jnp.int32(3)))
