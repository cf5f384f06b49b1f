"""spriteworld_tpu — a TPU-native multi-object RL environment framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
google-deepmind/spriteworld: procedurally generated 2-D multi-sprite scenes,
compositional factor distributions, click/embodied action spaces,
goal-finding/clustering/meta tasks, symbolic and pixel renderers — all as
pure functions over a struct-of-arrays state, jitted and sharded over device
meshes for massive batched throughput.
"""

__version__ = "0.1.0"

from spriteworld_tpu import constants
from spriteworld_tpu import sprite
from spriteworld_tpu.constants import SHAPES, ShapeType
from spriteworld_tpu.sprite import Sprite
from spriteworld_tpu.core.state import (
    FACTOR_NAMES,
    FACTOR_INDEX,
    EnvState,
    StepType,
    TimeStep,
)
