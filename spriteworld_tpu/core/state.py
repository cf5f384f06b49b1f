"""State pytrees for the TPU-native sprite engine.

The reference keeps a Python list of mutable `Sprite` objects
(/root/reference/spriteworld/sprite.py:45-214). The TPU engine instead keeps
one struct-of-arrays pytree: a dense factor matrix `f32[MAX_SPRITES, 10]` plus
a scalar live-count. Variable sprite counts become padding; sprites are always
*packed* — live sprites occupy the slot prefix [0, num_sprites), and slot
order encodes z-order (higher slot = foreground), mirroring the reference's
list-order occlusion semantics (pil_renderer.py:80-83, action_spaces.py:77-81).
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
import numpy as np
from flax import struct

# Factor column layout — order matches reference sprite.FACTOR_NAMES
# (/root/reference/spriteworld/sprite.py:28-39); the `shape` column holds the
# float-valued ShapeType id instead of a string.
FACTOR_NAMES = (
    "x", "y", "shape", "angle", "scale", "c0", "c1", "c2", "x_vel", "y_vel")
FACTOR_INDEX: Dict[str, int] = {n: i for i, n in enumerate(FACTOR_NAMES)}
NUM_FACTORS = len(FACTOR_NAMES)

X, Y, SHAPE, ANGLE, SCALE, C0, C1, C2, X_VEL, Y_VEL = range(NUM_FACTORS)

# Defaults of the reference Sprite constructor (sprite.py:56-66):
# x=0.5, y=0.5, shape='square'(id 2), angle=0, scale=0.1, colors 0, vels 0.
DEFAULT_FACTORS = np.array(
    [0.5, 0.5, 2.0, 0.0, 0.1, 0.0, 0.0, 0.0, 0.0, 0.0], dtype=np.float32)


def default_factor_rows(num_rows: int) -> jnp.ndarray:
    """[num_rows, 10] matrix of default sprite factors."""
    return jnp.tile(jnp.asarray(DEFAULT_FACTORS), (num_rows, 1))


def factors_to_dict(factors: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """View a factor matrix [..., 10] as a dict of per-factor arrays [...].

    This is the engine-side analogue of `Sprite.factors`
    (sprite.py:209-214); distribution `contains` masks consume it.
    """
    return {name: factors[..., i] for i, name in enumerate(FACTOR_NAMES)}


class StepType:
    """Integer step types, numerically identical to dm_env.StepType."""

    FIRST = 0
    MID = 1
    LAST = 2


@struct.dataclass
class TimeStep:
    """Array-valued timestep (batched analogue of dm_env.TimeStep).

    FIRST steps carry reward 0 and discount 1 (dm_env uses None there; the
    dm_env adapter restores that). LAST steps carry discount 0.
    """

    step_type: jnp.ndarray  # i32[...]
    reward: jnp.ndarray  # f32[...]
    discount: jnp.ndarray  # f32[...]
    observation: Any  # pytree of arrays

    def first(self):
        return self.step_type == StepType.FIRST

    def mid(self):
        return self.step_type == StepType.MID

    def last(self):
        return self.step_type == StepType.LAST


@struct.dataclass
class EnvState:
    """Complete environment state — one pytree, trivially checkpointable.

    Replaces the reference Environment's mutable attributes
    (environment.py:63-72): `_sprites` -> factors/num_sprites,
    `_step_count` -> step_count, `_reset_next_step` -> reset_next, plus an
    explicit PRNG key (the reference uses global np.random).
    """

    factors: jnp.ndarray  # f32[MAX_SPRITES, 10]
    num_sprites: jnp.ndarray  # i32 scalar
    step_count: jnp.ndarray  # i32 scalar
    reset_next: jnp.ndarray  # bool scalar
    key: jnp.ndarray  # PRNG key
    # False when this scene's rejection sampling exhausted its bound — the
    # jit-safe stand-in for the reference's ValueError on over-constrained
    # distributions (factor_distributions.py:248-249); the dm_env adapter
    # re-raises it host-side. SURVEY.md §5.3.
    sample_ok: jnp.ndarray = True  # bool scalar
    # False when the task's reward/success are undefined on this state —
    # currently only Clustering with <2 populated clusters, where the
    # reference's sklearn call raises (tasks.py:207-215). Like sample_ok,
    # the flag is raised host-side by the dm_env adapter; batched consumers
    # can mask on it.
    task_valid: jnp.ndarray = True  # bool scalar

    @property
    def alive(self) -> jnp.ndarray:
        """bool[MAX_SPRITES] mask of live sprite slots."""
        k = self.factors.shape[-2]
        return jnp.arange(k) < self.num_sprites
