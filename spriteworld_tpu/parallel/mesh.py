"""Device mesh and sharding helpers for the env-batch data-parallel layout.

Environments are mutually independent, so the engine's parallelism is pure
data parallelism over a 1-D `('envs',)` mesh (SURVEY.md §5.8): the env-state
pytree and all observation batches are sharded on their leading batch axis
with `NamedSharding(P('envs'))`. Cross-chip traffic then consists only of
XLA-inserted collectives for metric reductions (psum of success counts and
return sums), riding ICI within a slice and DCN across hosts.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

ENV_AXIS = "envs"


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> None:
    """Bring up JAX multi-host (DCN) coordination.

    Thin wrapper over `jax.distributed.initialize`: on Cloud TPU pods the
    arguments are auto-detected from the metadata server, elsewhere they
    must be passed. Safe to call when already initialized (no-op).
    """
    # NOTE: must not touch the XLA backend before initialize() — even
    # jax.process_count() would initialize it and make bring-up impossible.
    if jax.distributed.is_initialized():
        return
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id)
    except (ValueError, RuntimeError):
        if coordinator_address is not None:
            # Explicit bring-up must not fail silently: a worker that
            # cannot join its coordinator is a real error.
            raise
        # Auto-detected single-process environment (tests, one-chip
        # benches): fine as-is.
        pass


def env_mesh(devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """1-D mesh over all (or the given) devices, axis name 'envs'."""
    import numpy as np

    devs = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devs.reshape(-1), (ENV_AXIS,))


def env_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for batch-leading arrays: batch split across 'envs'.

    Applies to every leaf of EnvState/TimeStep batches — they all carry the
    env batch as axis 0 and are otherwise unsharded.
    """
    return NamedSharding(mesh, P(ENV_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    """Fully replicated placement (scalars, metrics, shared tables)."""
    return NamedSharding(mesh, P())
