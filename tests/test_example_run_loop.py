"""CLI smoke + semantics for the batched example run loop.

The showcase loop must keep the reference's per-episode log semantics
(success flag + nan-mean episode reward, example_run_loop.py:72-80) while
doing O(1) host work per step — the per-lane bookkeeping is masked numpy,
not a Python loop over lanes.
"""

import re
import warnings

from absl import flags
from absl import logging
from absl.testing import flagsaver
import numpy as np
import pytest

import example_run_loop


def _run_main(**overrides):
    # absl flags must be parsed once per process before flagsaver can set.
    if not flags.FLAGS.is_parsed():
        flags.FLAGS(["example_run_loop"])
    with flagsaver.flagsaver(**overrides):
        example_run_loop.main([])


def test_cli_smoke_logs_each_episode(caplog):
    with caplog.at_level(logging.converter.absl_to_standard(logging.INFO),
                         logger="absl"):
        _run_main(
            config="spriteworld_tpu.configs.examples.goal_finding_embodied",
            num_envs=4, num_episodes=1)
    lines = [r.getMessage() for r in caplog.records
             if "Episode done" in r.getMessage()]
    # target = num_episodes * num_envs; the final step may finish several
    # lanes at once, so >= target and < target + num_envs.
    assert 4 <= len(lines) < 8
    for line in lines:
        m = re.match(
            r"Episode done \(lane (\d+)\)\. Success = (True|False), "
            r"Reward = (\S+)", line)
        assert m, line
        assert 0 <= int(m.group(1)) < 4


def test_vectorized_bookkeeping_matches_reference_loop():
    """The masked-numpy accumulators produce the same per-episode nan-mean
    as the reference's append-then-nanmean list bookkeeping, replayed over
    an identical synthetic (step_type, reward) trace."""
    rng = np.random.default_rng(0)
    num_envs, steps = 8, 40
    step_types = rng.integers(0, 3, (steps, num_envs))
    rewards = rng.normal(size=(steps, num_envs)).astype(np.float32)
    rewards[rng.random((steps, num_envs)) < 0.1] = np.nan

    # Reference-style per-lane lists (the pre-round-5 implementation).
    lists = [[] for _ in range(num_envs)]
    want = []
    for t in range(steps):
        for lane in range(num_envs):
            if step_types[t, lane] == 0:
                continue
            lists[lane].append(rewards[t, lane])
            if step_types[t, lane] == 2:
                with warnings.catch_warnings():
                    warnings.simplefilter("ignore", RuntimeWarning)
                    want.append((lane, float(np.nanmean(lists[lane]))))
                lists[lane] = []

    # Vectorized accumulators (what main() now does).
    ep_sum = np.zeros(num_envs, np.float64)
    ep_cnt = np.zeros(num_envs, np.int64)
    got = []
    for t in range(steps):
        counted = (step_types[t] != 0) & ~np.isnan(rewards[t])
        ep_sum += np.where(counted, rewards[t], 0.0)
        ep_cnt += counted
        done = np.nonzero(step_types[t] == 2)[0]
        for lane in done:
            mean_r = (ep_sum[lane] / ep_cnt[lane] if ep_cnt[lane]
                      else float("nan"))
            got.append((int(lane), float(mean_r)))
        ep_sum[done] = 0.0
        ep_cnt[done] = 0

    assert len(got) == len(want)
    for (gl, gr), (wl, wr) in zip(got, want):
        assert gl == wl
        assert gr == pytest.approx(wr, nan_ok=True)
