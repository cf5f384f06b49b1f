"""Config-distribution parity vs the LIVE reference configs.

For every config module x mode, this walks the engine's generator/task trees
and the reference's generator/task closures in parallel
(/root/reference/spriteworld/sprite_generators.py:27-128 builds closures whose
free variables expose the underlying factor distributions) and asserts:

  * the generator tree *structure* matches (chain arity, OR branches, shuffle
    placement, leaf order, sprite counts);
  * cross-containment both ways for every leaf distribution: N reference
    samples all pass the engine distribution's ``contains`` and N engine
    samples all pass the reference distribution's ``contains``
    (the reference's own all-configs harness only smoke-runs episodes,
    /root/reference/tests/configs/configs_test.py:31-58 — this is stronger:
    a transposed bound or a swapped hue table in any ported config fails);
  * per-key empirical discrete support equality (catches candidate-table
    typos that containment alone might mask);
  * task parameters match: goal positions, terminate distances, reward
    multipliers, weights, aggregators, and task-level filter/cluster
    distributions (cross-containment again).

All sampling is seeded, so failures are deterministic.
"""

import importlib

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spriteworld_tpu import constants
from spriteworld_tpu.core import generators as gen_lib
from spriteworld_tpu.core import tasks as task_lib
from tests import ref_oracle

N_SAMPLES = 128

CONFIGS = [
    ("cobra.exploration", (None,)),
    ("cobra.goal_finding_new_position", ("train", "test")),
    ("cobra.goal_finding_new_shape", ("train", "test")),
    ("cobra.goal_finding_more_targets", ("train", "test")),
    ("cobra.goal_finding_more_distractors", ("train", "test")),
    ("cobra.clustering", ("train", "test")),
    ("cobra.sorting", ("train", "test")),
    ("examples.goal_finding_embodied", (None,)),
    ("examples.goal_finding_clustering", ("train", "test")),
]
FLAT = [(path, mode) for path, modes in CONFIGS for mode in modes]


def _ref_cells(fn):
    return dict(zip(fn.__code__.co_freevars,
                    (c.cell_contents for c in fn.__closure__ or ())))


def _ref_tree(fn):
    """Reference generator closure -> ('leaf'|'chain'|'or'|'shuffle', ...)."""
    qual = fn.__qualname__
    cells = _ref_cells(fn)
    if qual.startswith("generate_sprites."):
        return ("leaf", cells["factor_dist"], cells["num_sprites"])
    if qual.startswith("chain_generators."):
        return ("chain", [_ref_tree(g) for g in cells["sprite_generators"]])
    if qual.startswith("sample_generator."):
        return ("or", [_ref_tree(g) for g in cells["sprite_generators"]],
                cells["p"])
    if qual.startswith("shuffle."):
        return ("shuffle", _ref_tree(cells["sprite_generator"]))
    raise AssertionError(f"unknown reference generator closure: {qual}")


def _eng_tree(gen):
    if isinstance(gen, gen_lib.GenerateSprites):
        return ("leaf", gen.factor_dist, gen.num_sprites)
    if isinstance(gen, gen_lib.ChainGenerators):
        return ("chain", [_eng_tree(g) for g in gen.gens])
    if isinstance(gen, gen_lib.SampleGenerator):
        return ("or", [_eng_tree(g) for g in gen.gens], gen.p)
    if isinstance(gen, gen_lib.Shuffle):
        return ("shuffle", _eng_tree(gen.gen))
    raise AssertionError(f"unknown engine generator node: {type(gen)}")


def _to_engine_spec(ref_spec):
    """Reference sample dict -> engine spec dict (shape name -> float id)."""
    out = {}
    for k, v in ref_spec.items():
        if k == "shape" and isinstance(v, str):
            v = float(constants.ShapeType[v].value)
        out[k] = jnp.float32(float(v))
    return out


def _to_ref_spec(eng_spec):
    """Engine sample dict (float arrays) -> reference spec dict."""
    out = {}
    for k, v in eng_spec.items():
        v = float(v)
        if k == "shape":
            v = constants.ShapeType(int(round(v))).name
        out[k] = v
    return out


def _cross_check_distribs(eng_dist, ref_dist, label):
    """Cross-containment + discrete-support equality for one leaf pair."""
    assert eng_dist.keys == frozenset(ref_dist.keys), (
        f"{label}: key sets differ: {eng_dist.keys} vs {ref_dist.keys}")

    # Reference samples -> engine contains (batched: engine contains is
    # vectorized over arrays).
    ref_samples = [ref_dist.sample() for _ in range(N_SAMPLES)]
    batched = {
        k: jnp.asarray([_to_engine_spec(s)[k] for s in ref_samples])
        for k in ref_samples[0]}
    ok = np.asarray(eng_dist.contains(batched))
    assert ok.all(), (
        f"{label}: {int((~ok).sum())}/{N_SAMPLES} reference samples rejected "
        f"by engine distribution; first bad: {ref_samples[int(np.argmin(ok))]}")

    # Engine samples -> reference contains.
    keys = jax.random.split(jax.random.key(0), N_SAMPLES)
    eng_samples = jax.vmap(eng_dist.sample)(keys)
    eng_samples = {k: np.asarray(v) for k, v in eng_samples.items()}
    for i in range(N_SAMPLES):
        spec = _to_ref_spec({k: v[i] for k, v in eng_samples.items()})
        # Engine values are f32; reference Discrete containment is exact
        # float equality, so also try the spec snapped to 6 decimals
        # (0.13 stored as f32 reads back 0.1299999952...).
        snapped = {k: (v if isinstance(v, str) else round(v, 6))
                   for k, v in spec.items()}
        assert ref_dist.contains(spec) or ref_dist.contains(snapped), (
            f"{label}: engine sample {spec} rejected by reference "
            f"distribution {ref_dist}")

    # Empirical discrete-support equality per key: a key whose reference
    # samples take few distinct values must take exactly the same value set
    # in the engine (catches swapped candidate tables).
    for k in batched:
        ref_vals = {round(float(s), 6) for s in np.asarray(batched[k])}
        eng_vals = {round(float(v), 6) for v in eng_samples[k]}
        if len(ref_vals) <= 16:
            assert eng_vals == ref_vals, (
                f"{label}: discrete support mismatch for {k!r}: "
                f"engine {sorted(eng_vals)} vs reference {sorted(ref_vals)}")


def _check_counts(eng_n, ref_n, label):
    if callable(ref_n):
        assert isinstance(eng_n, gen_lib.RandInt), (
            f"{label}: reference uses a callable sprite count, engine must "
            f"use RandInt, got {eng_n!r}")
        draws = {int(ref_n()) for _ in range(300)}
        expected = set(range(eng_n.low, eng_n.high))
        assert draws == expected, (
            f"{label}: count support mismatch: reference draws {sorted(draws)}"
            f" vs engine RandInt [{eng_n.low}, {eng_n.high})")
    else:
        assert isinstance(eng_n, int) and eng_n == int(ref_n), (
            f"{label}: sprite count {eng_n} != reference {ref_n}")


def _compare_trees(eng, ref, label):
    assert eng[0] == ref[0], (
        f"{label}: node kind {eng[0]} != reference {ref[0]}")
    kind = eng[0]
    if kind == "leaf":
        _check_counts(eng[2], ref[2], label)
        _cross_check_distribs(eng[1], ref[1], label)
    elif kind == "chain":
        assert len(eng[1]) == len(ref[1]), (
            f"{label}: chain arity {len(eng[1])} != {len(ref[1])}")
        for i, (e, r) in enumerate(zip(eng[1], ref[1])):
            _compare_trees(e, r, f"{label}.chain[{i}]")
    elif kind == "or":
        assert len(eng[1]) == len(ref[1]), (
            f"{label}: OR branch count {len(eng[1])} != {len(ref[1])}")
        ep, rp = eng[2], ref[2]
        assert (ep is None) == (rp is None) and (
            ep is None or np.allclose(ep, rp)), (
            f"{label}: OR probs {ep} != {rp}")
        for i, (e, r) in enumerate(zip(eng[1], ref[1])):
            _compare_trees(e, r, f"{label}.or[{i}]")
    elif kind == "shuffle":
        _compare_trees(eng[1], ref[1], f"{label}.shuffle")


def _compare_tasks(eng_task, ref_task, label):
    ref_tasks_mod = ref_oracle.ref_module("tasks")
    if isinstance(eng_task, task_lib.NoReward):
        assert isinstance(ref_task, ref_tasks_mod.NoReward), label
    elif isinstance(eng_task, task_lib.FindGoalPosition):
        assert isinstance(ref_task, ref_tasks_mod.FindGoalPosition), label
        np.testing.assert_allclose(
            eng_task._goal_position, np.asarray(ref_task._goal_position),
            err_msg=f"{label}: goal_position")
        assert eng_task._terminate_distance == ref_task._terminate_distance, (
            f"{label}: terminate_distance")
        assert eng_task._terminate_bonus == ref_task._terminate_bonus, label
        assert eng_task._sparse_reward == ref_task._sparse_reward, label
        np.testing.assert_allclose(
            eng_task._weights_dimensions,
            np.asarray(ref_task._weights_dimensions),
            err_msg=f"{label}: weights_dimensions")
        assert (eng_task._raw_reward_multiplier
                == ref_task._raw_reward_multiplier), label
        e_f, r_f = eng_task._filter_distrib, ref_task._filter_distrib
        assert (e_f is None) == (r_f is None), f"{label}: filter presence"
        if e_f is not None:
            _cross_check_distribs(e_f, r_f, f"{label}.filter")
    elif isinstance(eng_task, task_lib.Clustering):
        assert isinstance(ref_task, ref_tasks_mod.Clustering), label
        assert (eng_task._termination_threshold
                == ref_task._termination_threshold), label
        assert eng_task._terminate_bonus == ref_task._terminate_bonus, label
        assert eng_task._reward_range == ref_task._reward_range, label
        assert len(eng_task._cluster_distribs) == len(
            ref_task._cluster_distribs), f"{label}: cluster count"
        for i, (e, r) in enumerate(zip(eng_task._cluster_distribs,
                                       ref_task._cluster_distribs)):
            _cross_check_distribs(e, r, f"{label}.cluster[{i}]")
    elif isinstance(eng_task, task_lib.MetaAggregated):
        assert isinstance(ref_task, ref_tasks_mod.MetaAggregated), label
        assert eng_task._terminate_bonus == ref_task._terminate_bonus, label
        assert len(eng_task._subtasks) == len(ref_task._subtasks), (
            f"{label}: subtask count")
        for i, (e, r) in enumerate(zip(eng_task._subtasks,
                                       ref_task._subtasks)):
            _compare_tasks(e, r, f"{label}.subtask[{i}]")
    else:
        raise AssertionError(f"{label}: unknown engine task {type(eng_task)}")


@pytest.mark.parametrize("path,mode", FLAT)
def test_config_distribution_parity(path, mode):
    np.random.seed(0)
    eng_mod = importlib.import_module(f"spriteworld_tpu.configs.{path}")
    ref_oracle.reference()
    ref_mod = ref_oracle.ref_module(f"configs.{path}")
    eng_cfg = eng_mod.get_config(mode) if mode else eng_mod.get_config()
    ref_cfg = ref_mod.get_config(mode) if mode else ref_mod.get_config()

    eng_tree = _eng_tree(eng_cfg["init_sprites"])
    ref_tree = _ref_tree(ref_cfg["init_sprites"])
    _compare_trees(eng_tree, ref_tree, f"{path}[{mode}]")
    _compare_tasks(eng_cfg["task"], ref_cfg["task"], f"{path}[{mode}].task")
    assert (eng_cfg["max_episode_length"]
            == ref_cfg["max_episode_length"]), "max_episode_length"
