"""Checkpoint/resume of the env-state pytree.

The reference has no checkpointing (SURVEY.md §5.4) — episode state is
transient Python objects. Here the entire simulation (factor arrays, step
counters, PRNG keys, batched over envs) is one pytree of arrays, so
checkpointing is just serializing that pytree; restoring it resumes the
exact trajectory stream (keys included).

Uses orbax when available (the standard JAX checkpoint stack, multi-host
aware), with a numpy .npz fallback for minimal environments.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from spriteworld_tpu.core.state import EnvState

try:  # pragma: no cover - environment-dependent
    import orbax.checkpoint as ocp

    _HAS_ORBAX = True
except Exception:  # pragma: no cover
    ocp = None
    _HAS_ORBAX = False


def _is_key(x) -> bool:
    return jax.dtypes.issubdtype(getattr(x, "dtype", None),
                                 jax.dtypes.prng_key)


def _unwrap_keys(tree: Any) -> Any:
    """Typed PRNG keys -> raw uint32 key data (serializable)."""
    return jax.tree.map(
        lambda x: jax.random.key_data(x) if _is_key(x) else x, tree)


def _rewrap_keys(tree: Any, like: Any) -> Any:
    return jax.tree.map(
        lambda x, l: jax.random.wrap_key_data(x) if _is_key(l) else x,
        tree, like)


def save_state(path: str, state: EnvState, *, force: bool = True) -> None:
    """Serialize an EnvState (any batch shape) to `path`."""
    path = os.path.abspath(path)
    state = _unwrap_keys(state)
    if _HAS_ORBAX:
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, state, force=force)
        ckptr.wait_until_finished()
        return
    leaves, _ = jax.tree.flatten(state)
    np.savez(path + ".npz", *[np.asarray(x) for x in leaves])


def restore_state(path: str, like: EnvState) -> EnvState:
    """Restore an EnvState saved by `save_state`.

    `like` provides the pytree structure/shapes/dtypes (e.g. a freshly
    reset state of the same env/batch); sharded targets restore sharded.
    """
    path = os.path.abspath(path)
    like_raw = _unwrap_keys(like)
    if _HAS_ORBAX:
        ckptr = ocp.StandardCheckpointer()
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, like_raw)
        restored = ckptr.restore(path, abstract)
        return _rewrap_keys(restored, like)
    leaves, treedef = jax.tree.flatten(like_raw)
    data = np.load(path + ".npz")
    restored = [
        jnp.asarray(data[f"arr_{i}"]).astype(l.dtype)
        for i, l in enumerate(leaves)
    ]
    return _rewrap_keys(jax.tree.unflatten(treedef, restored), like)
