"""dm_env adapter: a single-environment view onto the jitted engine.

Gives the TPU engine the exact interface of the reference Environment
(/root/reference/spriteworld/environment.py:27-161): a `dm_env.Environment`
with reset/step/observation_spec/action_spec plus the extra helpers
(`success`, `should_terminate`, `state`, `sample_contained_position`,
`action_space`). Observations are converted to reference-shaped host values:
the SpriteFactors renderer yields a list of per-sprite factor dicts
(handcrafted.py:51-82), Success yields a numpy bool, images are numpy uint8.

This is the compatibility tier: reference examples, the demo UI, and dm_env
conformance suites run unchanged against it. High-throughput consumers
should use `core.environment.BatchedEnvironment` directly.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import dm_env
from dm_env import specs as dm_specs
import jax
import jax.numpy as jnp
import numpy as np

from spriteworld_tpu import sprite as sprite_lib
from spriteworld_tpu.core import environment as env_lib
from spriteworld_tpu.core import renderers as renderers_lib
from spriteworld_tpu.core import state as state_lib


class Environment(dm_env.Environment):
    """Reference-compatible dm_env wrapper around the functional core."""

    def __init__(self,
                 task,
                 action_space,
                 renderers: Dict[str, Any],
                 init_sprites,
                 keep_in_frame: bool = True,
                 max_episode_length: int = 1000,
                 metadata: Optional[dict] = None,
                 seed: Optional[int] = None):
        self._env = env_lib.Environment(
            task=task,
            action_space=action_space,
            renderers=renderers,
            init_sprites=init_sprites,
            keep_in_frame=keep_in_frame,
            max_episode_length=max_episode_length,
            metadata=metadata)
        self._reset_fn = jax.jit(self._env.reset)
        self._step_fn = jax.jit(self._env.step)
        self._observe_fn = jax.jit(
            lambda state: self._env.observation(
                state.factors, state.num_sprites, self._env.success(state)))
        self._key = jax.random.key(0 if seed is None else seed)
        # ONE stable host action space per env (reference property returns
        # the same object every access, environment.py:159-161). Its rng is
        # seeded from the env seed but is a separate stream: sampling actions
        # must not perturb the episode key.
        self._host_action_space = HostActionSpace(
            self._env.action_space,
            rng=np.random.default_rng(
                None if seed is None else (seed + 0x5EED)))
        # Mirror the reference's eager __init__ scene draw + reset-on-first-
        # step flag (environment.py:68-70).
        self._key, sub = jax.random.split(self._key)
        self._state = self._env.initial_state(sub)

    # ------------------------------------------------------------------ #
    def _next_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    def _convert_obs(self, obs):
        out = {}
        n = int(self._state.num_sprites)
        for name, renderer in self._env.renderers.items():
            value = obs[name]
            if isinstance(renderer, renderers_lib.SpriteFactors):
                arr = np.asarray(value["factors"])
                out[name] = np.array([
                    {f: float(arr[i, j])
                     for j, f in enumerate(renderer.factor_names)}
                    for i in range(n)
                ])
            elif isinstance(renderer, renderers_lib.SpritePassthrough):
                # Reference passes the Sprite list through
                # (handcrafted.py:85-112): rebuild host-side Sprite objects
                # from the factor rows.
                arr = np.asarray(value["factors"])
                out[name] = np.array(
                    [sprite_lib.from_factor_row(arr[i]) for i in range(n)],
                    dtype=object)
            elif isinstance(renderer, renderers_lib.Success):
                out[name] = bool(np.asarray(value))
            else:
                out[name] = np.asarray(value)
        return out

    def _to_timestep(self, ts: state_lib.TimeStep) -> dm_env.TimeStep:
        st = int(ts.step_type)
        obs = self._convert_obs(ts.observation)
        if st == state_lib.StepType.FIRST:
            return dm_env.restart(obs)
        if st == state_lib.StepType.LAST:
            return dm_env.termination(reward=float(ts.reward),
                                      observation=obs)
        return dm_env.transition(reward=float(ts.reward), observation=obs)

    # ------------------------------------------------------------------ #
    # dm_env.Environment interface
    # ------------------------------------------------------------------ #
    def _check_sample_ok(self):
        """Re-raise exhausted rejection sampling host-side, mirroring the
        reference's ValueError (factor_distributions.py:248-249). Inside jit
        the engine can only flag it (EnvState.sample_ok); the single-env
        adapter is the host boundary where the raise belongs."""
        if not bool(self._state.sample_ok):
            raise ValueError(
                "Maximum number of tries exceeded when sampling the scene: "
                "the factor distribution is over-constrained and rejection "
                "sampling found no in-support sample within "
                "MAX_REJECTION_TRIES.")
        if not bool(self._state.task_valid):
            # Mirror sklearn's davies_bouldin_score ValueError, which the
            # reference propagates when the clustering leaves sklearn's
            # domain 1 < n_labels < n_samples (tasks.py:207-215) — fewer
            # than 2 populated clusters, or all-singleton clusters. Inside
            # jit the engine can only flag it (EnvState.task_valid); raise
            # at the host boundary.
            raise ValueError(
                "Task is undefined on the current state: the clustering "
                "violates sklearn's 1 < n_labels < n_samples domain (fewer "
                "than 2 populated clusters, or every populated cluster is a "
                "singleton), so the Davies-Bouldin metric does not exist "
                "(the reference's sklearn call raises here). Check the "
                "config's cluster_distribs against its scene distribution.")

    def reset(self) -> dm_env.TimeStep:
        self._state, ts = self._reset_fn(self._next_key())
        self._check_sample_ok()
        return self._to_timestep(ts)

    def step(self, action) -> dm_env.TimeStep:
        spec = self._env.action_spec()
        if isinstance(spec, list):  # Embodied: [carry, direction]
            action = jnp.asarray(np.asarray(action, dtype=np.int32))
        else:
            action = jnp.asarray(np.asarray(action, dtype=np.float32))
        self._state, ts = self._step_fn(self._state, action)
        self._check_sample_ok()
        return self._to_timestep(ts)

    def observation_spec(self):
        spec = {}
        n = int(self._state.num_sprites)
        for name, renderer in self._env.renderers.items():
            if isinstance(renderer, renderers_lib.SpriteFactors):
                per_object = {
                    f: dm_specs.Array(shape=(), dtype=np.float32)
                    for f in renderer.factor_names
                }
                spec[name] = [per_object for _ in range(n)]
            elif isinstance(renderer, renderers_lib.SpritePassthrough):
                # Reference spec: object array of Sprites
                # (handcrafted.py:110-112).
                spec[name] = dm_specs.Array(shape=(n,), dtype=object)
            elif isinstance(renderer, renderers_lib.Success):
                spec[name] = dm_specs.Array(shape=(), dtype=bool)
            elif isinstance(renderer, renderers_lib.ImageRenderer):
                spec[name] = dm_specs.Array(
                    shape=renderer.image_size + (3,), dtype=np.uint8)
            else:
                s = renderer.observation_spec()
                spec[name] = dm_specs.Array(
                    shape=s.shape, dtype=np.dtype(s.dtype))
        return spec

    def action_spec(self):
        return self._env.action_spec()

    # ------------------------------------------------------------------ #
    # Reference extras (environment.py:80-161)
    # ------------------------------------------------------------------ #
    def success(self) -> bool:
        return bool(jax.jit(self._env.success)(self._state))

    def should_terminate(self) -> bool:
        from spriteworld_tpu.ops import geometry

        oof = bool(geometry.out_of_frame(
            self._state.factors, self._state.num_sprites))
        timeout = int(self._state.step_count) \
            >= self._env.max_episode_length
        return self.success() or oof or timeout

    def state(self, as_sprites: bool = False):
        """Reference-style state dict (environment.py:128-134).

        `as_sprites=True` returns host Sprite objects (the reference form);
        the default stays the raw factor-row array for engine consumers.
        """
        global_state = {"success": self.success()}
        if self._env.metadata:
            global_state["metadata"] = self._env.metadata
        n = int(self._state.num_sprites)
        rows = np.asarray(self._state.factors)[:n]
        sprites = ([sprite_lib.from_factor_row(r) for r in rows]
                   if as_sprites else rows)
        return {
            "sprites": sprites,
            "global_state": global_state,
        }

    def sample_contained_position(self) -> np.ndarray:
        """Random position inside a random sprite (environment.py:110-126)."""
        n = int(self._state.num_sprites)
        factors = np.asarray(self._state.factors)
        rng = np.random.default_rng(
            int(jax.random.randint(self._next_key(), (), 0, 2**31 - 1)))
        idx = rng.integers(0, n)
        from spriteworld_tpu.ops import geometry

        verts = np.asarray(geometry.world_vertices(
            jnp.asarray(factors[idx])))
        lo, hi = verts.min(0), verts.max(0)
        for _ in range(100_000):
            p = rng.uniform(lo, hi)
            if bool(geometry.points_in_polygons(
                    jnp.asarray(verts), jnp.asarray(p, jnp.float32))):
                return p
        raise ValueError("max_tries exceeded in sample_contained_position")

    def observation(self):
        """Render the current state off-cycle (environment.py:136-142).

        The reference re-renders from `state()` on every call; here the
        jitted observe function rasterizes the current EnvState directly
        and the result is converted to reference-shaped host values.
        """
        return self._convert_obs(self._observe_fn(self._state))

    @property
    def action_space(self):
        return self._host_action_space


class HostActionSpace:
    """Reference-shaped view of an engine action space.

    The engine's `sample(key)` is a traced function returning device arrays
    (int32 for Embodied — the natural on-device dtype); reference-compatible
    agents instead call `action_space.sample()` with no arguments and pass
    the result straight to `dm_env` spec validation
    (/root/reference/spriteworld/action_spaces.py:106-108, 216-218). This
    wrapper samples host-side and returns values that `spec.validate`
    accepts exactly: a list of int64 scalars for the Embodied list-spec, a
    float32 vector for the click spaces. Everything else forwards to the
    wrapped engine space.
    """

    def __init__(self, space, rng=None):
        self._space = space
        self._rng = rng if rng is not None else np.random.default_rng()

    def action_spec(self):
        return self._space.action_spec()

    def sample(self):
        spec = self._space.action_spec()
        if isinstance(spec, (list, tuple)):  # Embodied: per-entry scalars
            return [s.dtype.type(self._rng.integers(0, s.num_values))
                    for s in spec]
        return self._rng.uniform(
            spec.minimum, spec.maximum,
            size=spec.shape).astype(spec.dtype)

    def __getattr__(self, name):
        return getattr(self._space, name)
