"""The environment core: pure jitted reset/step with per-lane auto-reset.

Rebuild of /root/reference/spriteworld/environment.py as a functional engine.
The `Environment` object holds only *static* configuration (task, action
space, renderers, scene generator, episode limits); all dynamic state lives
in an :class:`EnvState` pytree, and ``reset``/``step`` are pure traceable
functions, so the whole environment jits, vmaps over an env batch, and shards
over a device mesh.

Step pipeline (reference environment.py:88-108, preserved order):
  action cost -> velocity integration -> task reward -> observation ->
  terminate on success | out-of-frame | timeout.

Auto-reset replaces `_reset_next_step` (environment.py:70, 90-91): a step on
a terminated lane resamples the scene inside the same jitted call and emits a
FIRST timestep — including the reference quirk that the very first `step()`
before any `reset()` performs a reset (state starts with reset_next=True).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from spriteworld_tpu.core import state as state_lib
from spriteworld_tpu.core.tasks import task_valid
from spriteworld_tpu.core.state import EnvState, StepType, TimeStep
from spriteworld_tpu.ops import geometry


class Environment:
    """Static environment configuration + pure transition functions.

    Constructor signature mirrors the reference Environment.__init__
    (environment.py:34-41) so config dicts translate one-to-one; the
    difference is that `init_sprites` is a SpriteGenerator (traceable scene
    sampler) rather than a host callable.
    """

    def __init__(self,
                 task,
                 action_space,
                 renderers: Dict[str, Any],
                 init_sprites,
                 keep_in_frame: bool = True,
                 max_episode_length: int = 1000,
                 metadata: Optional[dict] = None):
        self._task = task
        self._action_space = action_space
        self._renderers = dict(renderers)
        self._init_sprites = init_sprites
        self._keep_in_frame = bool(keep_in_frame)
        self._max_episode_length = int(max_episode_length)
        self._metadata = metadata
        for r in self._renderers.values():
            r.bind(init_sprites.max_sprites)

    # ------------------------------------------------------------------ #
    # Static properties
    # ------------------------------------------------------------------ #
    @property
    def max_sprites(self) -> int:
        return self._init_sprites.max_sprites

    @property
    def task(self):
        return self._task

    @property
    def action_space(self):
        return self._action_space

    @property
    def renderers(self):
        return self._renderers

    @property
    def metadata(self):
        return self._metadata

    @property
    def max_episode_length(self) -> int:
        return self._max_episode_length

    def action_spec(self):
        return self._action_space.action_spec()

    def observation_spec(self):
        return {name: r.observation_spec()
                for name, r in self._renderers.items()}

    # ------------------------------------------------------------------ #
    # Pure transition functions (traceable; vmap over a batch of states)
    # ------------------------------------------------------------------ #
    def observation(self, factors, num_sprites, success):
        return {name: r.render(factors, num_sprites, success)
                for name, r in self._renderers.items()}

    def success(self, state: EnvState):
        return self._task.success(state.factors, state.num_sprites)

    def _fresh(self, key):
        k_scene, k_next = jax.random.split(key)
        factors, num, ok = self._init_sprites.sample_with_status(k_scene)
        return EnvState(
            factors=factors,
            num_sprites=num,
            step_count=jnp.int32(0),
            reset_next=jnp.bool_(False),
            key=k_next,
            sample_ok=ok,
            task_valid=task_valid(self._task, factors, num))

    def reset(self, key):
        """Sample a fresh scene; returns (EnvState, FIRST TimeStep)."""
        state = self._fresh(key)
        success = self._task.success(state.factors, state.num_sprites)
        obs = self.observation(state.factors, state.num_sprites, success)
        ts = TimeStep(
            step_type=jnp.int32(StepType.FIRST),
            reward=jnp.float32(0.0),
            discount=jnp.float32(1.0),
            observation=obs)
        return state, ts

    def transition(self, state: EnvState, action):
        """One state transition with auto-reset — no observation.

        Under vmap, `lax.cond` lowers to a select: both branches run for all
        lanes and the terminated lanes take the reset result — the standard
        batched auto-reset pattern. Rendering is deliberately hoisted OUT of
        the cond (and out of this function) so each step rasterizes exactly
        once and batched callers can use the renderers' batched fast paths.
        Returns (new_state, TimeStep with empty observation).
        """

        def reset_branch(operand):
            st, _ = operand
            fresh = self._fresh(st.key)
            ts = TimeStep(
                step_type=jnp.int32(StepType.FIRST),
                reward=jnp.float32(0.0),
                discount=jnp.float32(1.0),
                observation=())
            return fresh, ts

        def step_branch(operand):
            st, act = operand
            key_next, k_act = jax.random.split(st.key)
            factors, cost = self._action_space.step(
                act, st.factors, st.num_sprites, self._keep_in_frame, k_act)
            # Velocity integration for every sprite (environment.py:98-99);
            # dead slots carry zero velocity so padding is unaffected.
            new_pos = factors[..., 0:2] + factors[..., 8:10]
            if self._keep_in_frame:
                new_pos = jnp.clip(new_pos, 0.0, 1.0)
            factors = factors.at[..., 0:2].set(new_pos)

            reward = cost + self._task.reward(factors, st.num_sprites)
            success = self._task.success(factors, st.num_sprites)
            oof = geometry.out_of_frame(factors, st.num_sprites)
            step_count = st.step_count + 1
            terminate = success | oof \
                | (step_count >= self._max_episode_length)

            ts = TimeStep(
                step_type=jnp.where(
                    terminate, StepType.LAST, StepType.MID).astype(jnp.int32),
                reward=jnp.asarray(reward, jnp.float32),
                discount=jnp.where(terminate, 0.0, 1.0).astype(jnp.float32),
                observation=())
            new_state = EnvState(
                factors=factors,
                num_sprites=st.num_sprites,
                step_count=step_count,
                reset_next=terminate,
                key=key_next,
                sample_ok=st.sample_ok,
                task_valid=task_valid(self._task, factors, st.num_sprites))
            return new_state, ts

        return jax.lax.cond(
            state.reset_next, reset_branch, step_branch, (state, action))

    def step(self, state: EnvState, action):
        """One environment transition plus observation (single env)."""
        new_state, ts = self.transition(state, action)
        # One render of the post-transition state serves both branches; the
        # success flag re-derives cheaply from the task.
        success = self._task.success(new_state.factors, new_state.num_sprites)
        obs = self.observation(
            new_state.factors, new_state.num_sprites, success)
        return new_state, ts.replace(observation=obs)

    # ------------------------------------------------------------------ #
    # Batched transition functions (leading env-batch axis). These are the
    # fast paths: the state transition vmaps, while observations render
    # through each renderer's `render_batch` (the Pallas image kernel packs
    # several scenes per program there).
    # ------------------------------------------------------------------ #
    def observation_batch(self, factors, num_sprites, success):
        return {name: r.render_batch(factors, num_sprites, success)
                for name, r in self._renderers.items()}

    def step_batch(self, state: EnvState, actions):
        """Batched step: state pytree and actions carry a leading B axis."""
        with jax.named_scope("spriteworld.transition"):
            new_state, ts = jax.vmap(self.transition)(state, actions)
        with jax.named_scope("spriteworld.render"):
            success = jax.vmap(self._task.success)(
                new_state.factors, new_state.num_sprites)
            obs = self.observation_batch(
                new_state.factors, new_state.num_sprites, success)
        return new_state, ts.replace(observation=obs)

    def reset_batch(self, keys):
        """Batched reset from a [B] batch of PRNG keys."""
        state = jax.vmap(self._fresh)(keys)
        success = jax.vmap(self._task.success)(
            state.factors, state.num_sprites)
        obs = self.observation_batch(
            state.factors, state.num_sprites, success)
        b = keys.shape[0]
        ts = TimeStep(
            step_type=jnp.full((b,), StepType.FIRST, jnp.int32),
            reward=jnp.zeros((b,), jnp.float32),
            discount=jnp.ones((b,), jnp.float32),
            observation=obs)
        return state, ts

    def initial_state(self, key) -> EnvState:
        """State equivalent to a freshly constructed reference Environment.

        The reference eagerly samples sprites in __init__ and still resets on
        the first step (environment.py:68-70); here that is simply a state
        with reset_next=True.
        """
        k_scene, k_next = jax.random.split(key)
        factors, num, ok = self._init_sprites.sample_with_status(k_scene)
        return EnvState(
            factors=factors,
            num_sprites=num,
            step_count=jnp.int32(0),
            reset_next=jnp.bool_(True),
            key=k_next,
            sample_ok=ok,
            task_valid=task_valid(self._task, factors, num))

    def sample_action(self, key):
        return self._action_space.sample(key)


class BatchedEnvironment:
    """Convenience wrapper: jit + vmap of an Environment over B env lanes.

    The TPU analogue of running B independent reference environments
    (SURVEY.md §5.8); states and timesteps carry a leading batch axis. An
    optional `jax.sharding.Sharding` places that axis across devices.
    """

    def __init__(self, env: Environment, num_envs: int, sharding=None):
        self.env = env
        self.num_envs = int(num_envs)
        self._sharding = sharding

        reset_fn = env.reset_batch
        step_fn = env.step_batch
        if sharding is not None:
            self._reset = jax.jit(reset_fn, out_shardings=(sharding, sharding))
            self._step = jax.jit(
                step_fn, donate_argnums=(0,),
                in_shardings=(sharding, sharding),
                out_shardings=(sharding, sharding))
        else:
            self._reset = jax.jit(reset_fn)
            self._step = jax.jit(step_fn, donate_argnums=(0,))
        self._sample = jax.jit(
            lambda key: jax.vmap(env.sample_action)(
                jax.random.split(key, self.num_envs)))

    def reset(self, key):
        keys = jax.random.split(key, self.num_envs)
        if self._sharding is not None:
            keys = jax.device_put(keys, self._sharding)
        return self._reset(keys)

    def step(self, state, actions):
        return self._step(state, actions)

    def sample_actions(self, key):
        return self._sample(key)

    def observation_spec(self):
        return self.env.observation_spec()

    def action_spec(self):
        return self.env.action_spec()
