"""Action spaces as pure state-update functions.

TPU-native rebuild of /root/reference/spriteworld/action_spaces.py. Each
action space is a lightweight config object whose ``step`` is a traceable
pure function ``(action, factors, num_sprites, keep_in_frame, key) ->
(factors', cost)``; it vectorizes the reference's "scan sprites back-to-front,
move the topmost hit" logic into one containment mask + masked scatter.

Semantics preserved:
  * SelectMove: motion = (click2 - 0.5) * scale; optional Gaussian action
    noise; moves the topmost (foreground-most) sprite containing click1;
    cost = -motion_cost * ||motion|| (reference :29-111).
  * DragAndDrop: motion = (click2 - click1) * scale (reference :114-137).
  * Embodied: sprites[-1] (= last live slot) is the agent's body; action is
    [carry in {0,1}, direction in {0..3}]; when carrying, the topmost
    non-body sprite containing the body's center moves first, then the body;
    cost = -motion_cost * step_size (reference :140-221).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from spriteworld_tpu.core import state as state_lib
from spriteworld_tpu.ops import geometry


def _move_sprite(factors, idx, motion, do_move, keep_in_frame: bool):
    """Move sprite `idx` by `motion` if `do_move` (clip like sprite.py:103-107).

    `keep_in_frame` is static config, so the clip resolves at trace time.

    Implemented as a one-hot masked select over all K slots rather than a
    dynamic-index scatter: under vmap a traced-index `.at[idx].set` lowers to
    a TPU scatter, which benchmarked ~30x slower than this fully vectorized
    form (K is tiny, so touching every slot is free).
    """
    k = factors.shape[-2]
    sel = (jnp.arange(k) == idx) & do_move  # [..., K]
    pos = factors[..., 0:2]
    new_pos = pos + motion[..., None, :]
    if keep_in_frame:
        new_pos = jnp.clip(new_pos, 0.0, 1.0)
    pos = jnp.where(sel[..., None], new_pos, pos)
    return factors.at[..., 0:2].set(pos)


def _sprite_position(factors, idx):
    """Position of sprite `idx` as a one-hot contraction (gather-free)."""
    k = factors.shape[-2]
    onehot = (jnp.arange(k) == idx).astype(factors.dtype)  # [..., K]
    return jnp.einsum("...k,...kc->...c", onehot, factors[..., 0:2])


class SelectMove:
    """Two-click select-and-move: [click_x, click_y, motion_x, motion_y]."""

    ACTION_SIZE = 4

    def __init__(self, scale: float = 1.0, motion_cost: float = 0.0,
                 noise_scale: Optional[float] = None):
        self._scale = scale
        self._motion_cost = motion_cost
        self._noise_scale = noise_scale

    # --- traceable pieces -------------------------------------------------
    def get_motion(self, action):
        return (action[2:] - 0.5) * self._scale

    def apply_noise_to_action(self, action, key):
        if not self._noise_scale:
            return action
        noise = self._noise_scale * jax.random.normal(
            key, action.shape, action.dtype)
        return action + noise

    def step(self, action, factors, num_sprites, keep_in_frame, key):
        action = self.apply_noise_to_action(jnp.asarray(action), key)
        position = action[:2]
        motion = self.get_motion(action)
        hits = geometry.sprites_containing_point(factors, position)
        idx, any_hit = geometry.topmost_hit(hits, num_sprites)
        factors = _move_sprite(factors, idx, motion, any_hit, keep_in_frame)
        cost = -self._motion_cost * jnp.linalg.norm(motion)
        return factors, cost

    def sample(self, key):
        return jax.random.uniform(key, (4,), jnp.float32)

    # --- host-side metadata ----------------------------------------------
    def action_spec(self):
        from dm_env import specs

        return specs.BoundedArray(
            shape=(4,), dtype=np.float32, minimum=0.0, maximum=1.0)

    @property
    def action_shape_dtype(self):
        return (4,), jnp.float32


class DragAndDrop(SelectMove):
    """Like SelectMove but motion is relative to the first click."""

    def get_motion(self, action):
        return (action[2:] - action[:2]) * self._scale


class Embodied:
    """Grid-motion embodied agent with adhere-and-carry physics."""

    ACTION_SIZE = 2

    def __init__(self, step_size: float = 0.05, motion_cost: float = 0.0):
        self._step_size = step_size
        self._motion_cost = motion_cost
        # Motion table rows: Up, Left, Down, Right (reference :165-170).
        self._motions = np.array(
            [[0.0, step_size], [-step_size, 0.0],
             [0.0, -step_size], [step_size, 0.0]], dtype=np.float32)

    def step(self, action, factors, num_sprites, keep_in_frame, key):
        del key
        action = jnp.asarray(action)
        carry = action[0]
        motion = jnp.asarray(self._motions)[action[1].astype(jnp.int32)]
        body_idx = jnp.maximum(num_sprites - 1, 0)
        body_pos = _sprite_position(factors, body_idx)
        # Topmost non-body sprite whose polygon contains the body center
        # (decided from pre-move positions, like reference :180-213).
        hits = geometry.sprites_containing_point(factors, body_pos)
        carried_idx, has_carried = geometry.topmost_hit(
            hits, jnp.maximum(num_sprites - 1, 0))
        do_carry = has_carried & (carry > 0)
        factors = _move_sprite(
            factors, carried_idx, motion, do_carry, keep_in_frame)
        factors = _move_sprite(
            factors, body_idx, motion, num_sprites > 0, keep_in_frame)
        cost = jnp.float32(-self._motion_cost * self._step_size)
        return factors, cost

    def sample(self, key):
        k1, k2 = jax.random.split(key)
        return jnp.stack([
            jax.random.randint(k1, (), 0, 2),
            jax.random.randint(k2, (), 0, 4),
        ]).astype(jnp.int32)

    def action_spec(self):
        from dm_env import specs

        return [
            specs.DiscreteArray(num_values=2, dtype=np.int64),
            specs.DiscreteArray(num_values=4, dtype=np.int64),
        ]

    @property
    def action_shape_dtype(self):
        return (2,), jnp.int32
