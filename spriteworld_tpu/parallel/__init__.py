"""Scale-out layer: device meshes, sharded env batches, multi-host runner.

The reference is single-process/single-thread (SURVEY.md §2: no parallelism
components exist in /root/reference). This package is the TPU-native
equivalent mandated by the build target: env batches sharded over a 1-D
device mesh with pjit, metrics reduced on-device via XLA collectives, and
multi-host bring-up over DCN.
"""

from spriteworld_tpu.parallel.mesh import (  # noqa: F401
    env_mesh, env_sharding, initialize_multihost, replicated_sharding)
from spriteworld_tpu.parallel.runner import (  # noqa: F401
    EvalStats, Metrics, ShardedRunner)
from spriteworld_tpu.parallel.checkpoint import (  # noqa: F401
    restore_state, save_state)
