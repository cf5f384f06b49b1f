"""Tasks as pure reward/success functions over the factor state.

TPU-native rebuild of /root/reference/spriteworld/tasks.py. Each task is a
config object whose ``reward(factors, num_sprites) -> f32`` and
``success(factors, num_sprites) -> bool`` are traceable pure functions over
the packed factor matrix.

Contract quirks preserved exactly (SURVEY.md §2.7):
  * FindGoalPosition returns NaN when no sprite passes the filter
    (tasks.py:144-146) — and its `success` is vacuously True then
    (`all([])`, tasks.py:157-158).
  * MetaAggregated combines subtask rewards with NaN-ignoring aggregators
    (tasks.py:250-255) and adds `terminate_bonus * success`.
  * Clustering scores 1/davies_bouldin and assigns each sprite to the FIRST
    cluster distribution containing it (tasks.py:196-205).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np

from spriteworld_tpu.core import state as state_lib
from spriteworld_tpu.ops import clustering as clustering_ops


class NoReward:
    """Zero reward, never succeeds (reference :70-81)."""

    def reward(self, factors, num_sprites):
        del factors, num_sprites
        return jnp.float32(0.0)

    def success(self, factors, num_sprites):
        del factors, num_sprites
        return jnp.bool_(False)


class FindGoalPosition:
    """Bring all (filtered) sprites within a distance of a goal position."""

    def __init__(self,
                 filter_distrib=None,
                 goal_position=(0.5, 0.5),
                 terminate_distance: float = 0.05,
                 terminate_bonus: float = 0.0,
                 weights_dimensions=(1, 1),
                 sparse_reward: bool = False,
                 raw_reward_multiplier: float = 50):
        self._filter_distrib = filter_distrib
        self._goal_position = np.asarray(goal_position, dtype=np.float32)
        self._terminate_bonus = terminate_bonus
        self._terminate_distance = terminate_distance
        self._sparse_reward = sparse_reward
        self._weights_dimensions = np.asarray(
            weights_dimensions, dtype=np.float32)
        self._raw_reward_multiplier = raw_reward_multiplier

    def _per_sprite_rewards(self, factors):
        """f32[K]: mult * (terminate_distance - weighted distance to goal)."""
        pos = factors[..., 0:2]
        delta = pos - jnp.asarray(self._goal_position)
        dist = jnp.sqrt(
            jnp.sum(jnp.asarray(self._weights_dimensions) * delta ** 2,
                    axis=-1))
        return self._raw_reward_multiplier * (self._terminate_distance - dist)

    def _filter_mask(self, factors, num_sprites):
        k = factors.shape[-2]
        alive = jnp.arange(k) < num_sprites
        if self._filter_distrib is None:
            return alive
        passes = self._filter_distrib.contains(
            state_lib.factors_to_dict(factors))
        return alive & passes

    def reward(self, factors, num_sprites):
        rewards = self._per_sprite_rewards(factors)
        mask = self._filter_mask(factors, num_sprites)
        count = mask.sum()
        dense = jnp.where(mask, rewards, 0.0).sum()
        succeeded = jnp.all(jnp.where(mask, rewards, jnp.inf) >= 0)
        bonus = jnp.where(succeeded, self._terminate_bonus + dense, 0.0)
        shaped = jnp.where(
            succeeded, bonus,
            0.0 if self._sparse_reward else dense)
        return jnp.where(count > 0, shaped, jnp.nan)

    def success(self, factors, num_sprites):
        rewards = self._per_sprite_rewards(factors)
        mask = self._filter_mask(factors, num_sprites)
        # Vacuously True on an empty filter, like `all([])` (tasks.py:157-158).
        return jnp.all(jnp.where(mask, rewards, jnp.inf) >= 0)


class Clustering:
    """Cluster sprites; reward from the inverse Davies-Bouldin index."""

    def __init__(self,
                 cluster_distribs: Sequence,
                 termination_threshold: float = 2.5,
                 terminate_bonus: float = 0.0,
                 sparse_reward: bool = False,
                 reward_range: float = 10):
        self._cluster_distribs = list(cluster_distribs)
        self._num_clusters = len(self._cluster_distribs)
        self._termination_threshold = termination_threshold
        self._terminate_bonus = terminate_bonus
        self._sparse_reward = sparse_reward
        self._reward_range = reward_range

    def _membership(self, factors, num_sprites):
        """bool[K, C]: sprite k belongs to the FIRST cluster containing it."""
        spec = state_lib.factors_to_dict(factors)
        contains = jnp.stack(
            [d.contains(spec) for d in self._cluster_distribs], axis=-1)
        assigned = jnp.any(contains, axis=-1)
        first = jnp.argmax(contains, axis=-1)  # first True wins
        k = factors.shape[-2]
        alive = jnp.arange(k) < num_sprites
        one_hot = jnp.arange(self._num_clusters)[None, :] == first[:, None]
        return one_hot & (assigned & alive)[:, None]

    def _metric(self, factors, num_sprites):
        member = self._membership(factors, num_sprites)
        db = clustering_ops.davies_bouldin_index(factors[..., 0:2], member)
        return 1.0 / db

    def reward(self, factors, num_sprites):
        metric = self._metric(factors, num_sprites)
        dense = (metric - self._termination_threshold) \
            * self._reward_range / 2.0
        succeeded = metric >= self._termination_threshold
        bonus = jnp.where(succeeded, self._terminate_bonus + dense, 0.0)
        return jnp.where(
            succeeded, bonus, 0.0 if self._sparse_reward else dense)

    def success(self, factors, num_sprites):
        return self._metric(factors, num_sprites) \
            >= self._termination_threshold

    def valid(self, factors, num_sprites):
        """True exactly on sklearn davies_bouldin_score's domain.

        sklearn's check_number_of_labels requires ``1 < n_labels <
        n_samples`` (the reference propagates its ValueError,
        tasks.py:207-215), where n_samples counts the sprites assigned to
        any cluster and n_labels the distinct populated clusters. The
        upper edge matters: with all-singleton clusters (n_labels ==
        n_samples, e.g. 2 sprites in 2 clusters) every intra-cluster
        distance is 0, the engine metric degenerates to 1/0 = inf, and the
        reference raises — so that state must be flagged invalid too.
        Inside jit we flag instead of raising; the dm_env adapter
        re-raises host-side."""
        member = self._membership(factors, num_sprites)
        n_labels = jnp.any(member, axis=0).sum()
        n_samples = member.sum()
        return (n_labels >= 2) & (n_labels < n_samples)


_AGGREGATORS = {
    "sum": jnp.nansum,
    "max": jnp.nanmax,
    "min": jnp.nanmin,
    "mean": jnp.nanmean,
}
_CRITERIA = {"all": jnp.all, "any": jnp.any}


class MetaAggregated:
    """NaN-aware aggregation of several subtasks (reference :248-296)."""

    def __init__(self,
                 subtasks: Sequence,
                 reward_aggregator: str = "sum",
                 termination_criterion: str = "all",
                 terminate_bonus: float = 0.0):
        if reward_aggregator not in _AGGREGATORS:
            raise ValueError(
                f"Unknown reward_aggregator. {reward_aggregator} not in "
                f"{sorted(_AGGREGATORS)}")
        if termination_criterion not in _CRITERIA:
            raise ValueError(
                f"Unknown termination_criterion. {termination_criterion} "
                f"not in {sorted(_CRITERIA)}")
        self._subtasks = list(subtasks)
        self._reward_aggregator = _AGGREGATORS[reward_aggregator]
        self._termination_criterion = _CRITERIA[termination_criterion]
        self._terminate_bonus = terminate_bonus

    def reward(self, factors, num_sprites):
        rewards = jnp.stack(
            [t.reward(factors, num_sprites) for t in self._subtasks])
        agg = self._reward_aggregator(rewards)
        return agg + self._terminate_bonus \
            * self.success(factors, num_sprites)

    def success(self, factors, num_sprites):
        successes = jnp.stack(
            [t.success(factors, num_sprites) for t in self._subtasks])
        return self._termination_criterion(successes)

    def valid(self, factors, num_sprites):
        valids = jnp.stack(
            [task_valid(t, factors, num_sprites) for t in self._subtasks])
        return jnp.all(valids)


def task_valid(task, factors, num_sprites) -> jnp.ndarray:
    """Whether the task's reward/success are well-defined on this state.

    Tasks without a `valid` method (NoReward, FindGoalPosition — whose NaN
    rewards are contractual, reference tasks.py:144-146) are always valid;
    Clustering is invalid with <2 populated clusters, where the reference's
    sklearn call raises instead of returning a value.
    """
    fn = getattr(task, "valid", None)
    if fn is None:
        return jnp.bool_(True)
    return fn(factors, num_sprites)
