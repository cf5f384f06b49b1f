"""Sharded multi-env runner: scan-fused rollouts with on-device metrics.

The TPU replacement for replicating the reference's host loop
(/root/reference/example_run_loop.py:62-80): B env lanes stepped in lockstep
inside one jitted `lax.scan`, the batch sharded over the 'envs' mesh axis.
A whole rollout chunk is a single device program — per-step host dispatch
(the dominant cost of naive loops) disappears, and episode statistics are
aggregated on-device (XLA turns the cross-batch sums into psums over ICI).

Metrics mirror what the reference logs per episode
(example_run_loop.py:79-80: success + nanmean reward), lifted to batched
aggregates: completed episodes, successes at termination, summed returns
(NaN rewards from unfiltered FindGoalPosition tasks are excluded the same
way the reference's np.nanmean excludes them).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import struct

from spriteworld_tpu.core.environment import Environment
from spriteworld_tpu.parallel import mesh as mesh_lib


@struct.dataclass
class Metrics:
    """Rollout aggregates.

    On-device (inside one rollout chunk) the counters are i32 — JAX cannot
    carry true i64 without global x64 — and a chunk is guarded to stay far
    below i32 range. At the host boundary `ShardedRunner.rollout` converts
    counters to Python ints, so accumulation across chunks (the only place
    the i32 ceiling could ever be reached: ~2.4h of stepping at measured
    throughput) is arbitrary-precision.
    """

    steps: jnp.ndarray          # int: total env steps taken
    episodes: jnp.ndarray       # int: episodes completed (LAST timesteps)
    successes: jnp.ndarray      # int: episodes that ended in task success
    return_sum: jnp.ndarray     # f32: sum of completed-episode returns
    reward_sum: jnp.ndarray     # f32: nan-excluded sum of all step rewards

    @classmethod
    def zero(cls) -> "Metrics":
        z = jnp.int64(0) if jax.config.read("jax_enable_x64") else jnp.int32(0)
        return cls(steps=z, episodes=z, successes=z,
                   return_sum=jnp.float32(0.0), reward_sum=jnp.float32(0.0))

    def __add__(self, other: "Metrics") -> "Metrics":
        return jax.tree.map(lambda a, b: a + b, self, other)

    @property
    def success_rate(self):
        return self.successes / jnp.maximum(self.episodes, 1)

    @property
    def mean_return(self):
        return self.return_sum / jnp.maximum(self.episodes, 1)


@struct.dataclass
class EvalStats:
    """Per-episode evaluation aggregates (see ShardedRunner.evaluate)."""

    episodes: int
    mean_return: float
    std_return: float
    ci95_return: float
    success_rate: float


class ShardedRunner:
    """Steps a batch of envs sharded over a device mesh.

    Args:
      env: the Environment (pure transition functions).
      num_envs: global batch size; must divide by mesh device count.
      mesh: 1-D 'envs' mesh; defaults to all devices.
      policy: optional `(key, state, timestep_obs) -> actions` batch policy;
        defaults to the env's uniform random action sampler (the reference's
        RandomAgent, example_run_loop.py:46-59).
    """

    def __init__(self,
                 env: Environment,
                 num_envs: int,
                 mesh=None,
                 policy: Optional[Callable] = None):
        self.env = env
        self.num_envs = int(num_envs)
        self.mesh = mesh if mesh is not None else mesh_lib.env_mesh()
        if self.num_envs % self.mesh.size:
            raise ValueError(
                f"num_envs={num_envs} must divide the mesh size "
                f"{self.mesh.size}.")
        self._shard = mesh_lib.env_sharding(self.mesh)
        self._repl = mesh_lib.replicated_sharding(self.mesh)
        self._policy = policy

        self._reset = jax.jit(
            env.reset_batch,
            out_shardings=((self._shard, self._shard)))
        # Key-splitting and accumulator init run ON device with explicit
        # out_shardings (a host device_put cannot target a multi-process
        # global sharding; this path works on any mesh, incl. multi-host).
        self._make_keys = jax.jit(
            lambda key: jax.random.split(key, self.num_envs),
            out_shardings=self._shard)
        self._zero_returns = jax.jit(
            lambda: jnp.zeros((self.num_envs,), jnp.float32),
            out_shardings=self._shard)
        self._rollout_cache = {}

    # ------------------------------------------------------------------ #
    def reset(self, key):
        state, ts = self._reset(self._make_keys(key))
        # Per-lane in-progress return accumulator rides alongside the state.
        self._ret_acc = self._zero_returns()
        return state, ts

    def _actions(self, key, state):
        if self._policy is not None:
            return self._policy(key, state)
        keys = jax.random.split(key, self.num_envs)
        return jax.vmap(self.env.sample_action)(keys)

    def _build_rollout(self, num_steps: int, with_returns,
                       obs_keys=None):
        env = self.env

        def slim_obs(obs):
            # Optionally keep only the requested observation keys in the
            # stacked trace (evaluate() needs just "success"), and
            # ALWAYS flatten image-like leaves to [B, H*W*C]: TPU tiled
            # layouts pad a trailing RGB dim 3 to a full 128-lane tile,
            # so stacking raw [T, B, H, W, 3] u8 frames inflates ~43x in
            # HBM (a 20-step 64x64 trace at 2048 lanes would exceed the
            # chip). Callers get the un-flattened view back from
            # `rollout` on the host side.
            if obs_keys is not None and isinstance(obs, dict):
                obs = {k: v for k, v in obs.items() if k in obs_keys}
            return jax.tree.map(
                lambda l: l.reshape(l.shape[0], -1) if l.ndim > 2 else l,
                obs)

        def body(carry, _):
            state, key, ret_acc = carry
            key, k_act = jax.random.split(key)
            actions = self._actions(k_act, state)
            state, ts = env.step_batch(state, actions)

            last = ts.last()
            reward = jnp.nan_to_num(ts.reward)  # nanmean-style exclusion
            ret_acc = ret_acc + reward
            zero = jnp.zeros((), ret_acc.dtype)
            ep_return = jnp.where(last, ret_acc, zero)
            ret_acc = jnp.where(last, zero, ret_acc)

            # Success is observed through the renderer-as-metrics pattern
            # (reference example_run_loop.py:67); absent renderer -> False.
            success = ts.observation.get("success", jnp.zeros_like(last))

            cnt = Metrics.zero().steps.dtype
            m = Metrics(
                steps=jnp.asarray(last.shape[0], cnt),
                episodes=last.sum(dtype=cnt),
                successes=(last & success).sum(dtype=cnt),
                return_sum=ep_return.sum(dtype=jnp.float32),
                reward_sum=reward.sum(dtype=jnp.float32))
            out = ts.replace(observation=slim_obs(ts.observation)) \
                if with_returns else None
            return (state, key, ret_acc), (m, out)

        def rollout(state, key, ret_acc):
            (state, key, ret_acc), (ms, tss) = jax.lax.scan(
                body, (state, key, ret_acc), length=num_steps)
            metrics = jax.tree.map(lambda x: x.sum(0), ms)
            return state, key, ret_acc, metrics, tss

        shard, repl = self._shard, self._repl
        if with_returns:
            # Stacked timesteps are [T, B, ...]: batch axis moves to dim 1.
            from jax.sharding import NamedSharding, PartitionSpec as P
            ts_shard = NamedSharding(self.mesh, P(None, mesh_lib.ENV_AXIS))
        else:
            ts_shard = None
        return jax.jit(
            rollout,
            donate_argnums=(0, 2),
            in_shardings=(shard, repl, shard),
            out_shardings=(shard, repl, shard, repl, ts_shard))

    # ------------------------------------------------------------------ #
    @property
    def episode_returns(self) -> jnp.ndarray:
        """Per-lane in-flight episode return accumulator (f32[num_envs]).

        Checkpoint this alongside the EnvState and assign it back after
        `restore_state` — otherwise returns of episodes already in flight
        at save time restart from zero (see parallel/checkpoint.py).
        """
        if getattr(self, "_ret_acc", None) is None:
            self._ret_acc = self._zero_returns()
        return self._ret_acc

    @episode_returns.setter
    def episode_returns(self, value):
        value = jnp.asarray(value, jnp.float32)
        if value.shape != (self.num_envs,):
            raise ValueError(
                f"episode_returns must have shape ({self.num_envs},), got "
                f"{value.shape}")
        self._ret_acc = jax.device_put(value, self._shard) \
            if self._shard.is_fully_addressable else value

    def rollout(self, state, key, num_steps: int, return_timesteps=False,
                episode_returns=None, timestep_obs=None):
        """Run `num_steps` lockstep steps; returns (state, key, Metrics[, ts]).

        The whole chunk is one device program. `return_timesteps=True`
        additionally stacks every TimeStep (use small chunks: the obs
        trace is [T, B, ...] in HBM). In the stacked trace, observation
        leaves with more than one per-lane dim come back FLATTENED to
        [T, B, -1]: TPU tiled layouts pad the two minor dims to (8, 128),
        so stacking e.g. raw [T, B, H, W, 3] u8 frames would inflate
        ~43x in HBM; reshape on the host via the env's observation_spec
        if you need the original shapes. `timestep_obs` optionally
        restricts the stacked observations to the given top-level keys.
        `episode_returns` optionally seeds the per-lane in-flight return
        accumulator (e.g. restored from a checkpoint); by default the
        accumulator carried since the last `reset()` is used.
        """
        if episode_returns is not None:
            self.episode_returns = episode_returns
        if int(num_steps) * self.num_envs >= 2**31:
            raise ValueError(
                f"A single chunk of {num_steps} steps x {self.num_envs} "
                "envs would overflow the on-device i32 step counter; split "
                "into smaller chunks (host-side accumulation is unbounded).")
        if timestep_obs is not None:
            timestep_obs = tuple(timestep_obs)
        sig = (int(num_steps), bool(return_timesteps), timestep_obs)
        if sig not in self._rollout_cache:
            self._rollout_cache[sig] = self._build_rollout(*sig)
        state, key, self._ret_acc, metrics, tss = self._rollout_cache[sig](
            state, key, self.episode_returns)
        # Counters leave the device as Python ints: cross-chunk accumulation
        # can never overflow (the i32 dtype only ever spans one chunk).
        metrics = metrics.replace(
            steps=int(metrics.steps), episodes=int(metrics.episodes),
            successes=int(metrics.successes))
        if return_timesteps:
            return state, key, metrics, tss
        return state, key, metrics

    # ------------------------------------------------------------------ #
    def evaluate(self, key, num_episodes: int, chunk_steps: int = 128,
                 max_chunks: int = 1000) -> "EvalStats":
        """Policy evaluation: run until >= `num_episodes` episodes finish.

        The TPU-shaped replacement for the reference's per-episode eval
        loop (example_run_loop.py:72-80): all lanes run in lockstep
        chunks; per-episode returns and successes are recovered exactly
        on the host from the stacked timesteps (NaN rewards excluded the
        same way the reference's np.nanmean does). Returns `EvalStats`
        with mean/std/95%-CI of episode returns and the success rate.

        Episodes still in flight when the target is reached are
        discarded (no length bias toward short episodes beyond the
        cutoff chunk). Within the cutoff chunk itself, `num_episodes`
        is hit mid-chunk and the earliest-finishing episodes of that
        chunk are kept — a mild bias toward shorter episodes at the
        margin (bounded by one chunk's worth of episodes; shrink
        `chunk_steps` to shrink it). The runner's own rollout stream is undisturbed:
        the in-flight episode-return accumulator carried since the
        caller's last `reset()` is saved and restored around the
        evaluation, so training metrics for episodes straddling an
        evaluate() call stay correct.
        """
        import numpy as np

        saved_ret_acc = getattr(self, "_ret_acc", None)
        try:
            state, _ = self.reset(key)
            key = jax.random.fold_in(key, 1)
            acc = np.zeros((self.num_envs,), np.float64)
            returns = []
            successes = []
            for _ in range(max_chunks):
                if len(returns) >= num_episodes:
                    break
                state, key, _, tss = self.rollout(
                    state, key, chunk_steps, return_timesteps=True,
                    timestep_obs=("success",))
                rew = np.nan_to_num(np.asarray(tss.reward, np.float64))
                last = np.asarray(tss.last())
                succ = np.asarray(tss.observation["success"]) \
                    if isinstance(tss.observation, dict) \
                    and "success" in tss.observation else np.zeros_like(last)
                for t in range(rew.shape[0]):
                    acc += rew[t]
                    done = last[t]
                    if done.any():
                        returns.extend(acc[done].tolist())
                        successes.extend(np.asarray(succ[t][done]).tolist())
                        acc[done] = 0.0
            if len(returns) < num_episodes:
                raise RuntimeError(
                    f"evaluate() hit max_chunks={max_chunks} with only "
                    f"{len(returns)}/{num_episodes} episodes; is the env "
                    "terminating?")
        finally:
            self._ret_acc = saved_ret_acc
        returns_arr = np.asarray(returns[:num_episodes], np.float64)
        succ_arr = np.asarray(successes[:num_episodes], np.float64)
        n = len(returns_arr)
        std = float(returns_arr.std(ddof=1)) if n > 1 else 0.0
        sem = std / np.sqrt(n) if n > 1 else 0.0
        return EvalStats(
            episodes=n,
            mean_return=float(returns_arr.mean()),
            std_return=std,
            ci95_return=1.96 * float(sem),
            success_rate=float(succ_arr.mean()),
        )
