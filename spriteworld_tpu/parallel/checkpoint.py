"""Checkpoint/resume of simulation pytrees.

The reference has no checkpointing (SURVEY.md §5.4) — episode state is
transient Python objects. Here the entire simulation (factor arrays, step
counters, PRNG keys, batched over envs) is one pytree of arrays, so
checkpointing is just serializing that pytree; restoring it resumes the
exact trajectory stream (keys included).

`save_state`/`restore_state` accept ANY pytree, not just EnvState — in
particular the recommended runner checkpoint is::

    ckpt = {"env_state": state, "episode_returns": runner.episode_returns}
    save_state(path, ckpt)
    ...
    restored = restore_state(path, like=ckpt_like)
    runner.episode_returns = restored["episode_returns"]

so per-episode returns of episodes in flight at save time survive a
kill-and-resume (see tests/test_parallel.py).

Uses orbax when available (the standard JAX checkpoint stack, multi-host
aware), with a numpy .npz fallback for minimal environments.

Forward migration: the npz format stores leaves keyed by their *tree path*
(not positionally), so a checkpoint taken before a state field existed
restores cleanly — missing leaves are filled from `like` (i.e. defaults)
with a warning, extra leaves are ignored. Orbax `StandardCheckpointer`
requires matching structures; on a structure mismatch `restore_state`
falls back to a per-leaf path-matched restore with the same
default-filling behavior.
"""

from __future__ import annotations

import os
import warnings
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

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


def _path_str(path) -> str:
    return jax.tree_util.keystr(path)


def _flatten_with_paths(tree: Any):
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    return [(_path_str(p), leaf) for p, leaf in flat], treedef


def save_state(path: str, state: Any, *, force: bool = True) -> None:
    """Serialize a pytree of arrays (e.g. an EnvState) to `path`."""
    path = os.path.abspath(path)
    state = _unwrap_keys(state)
    if _HAS_ORBAX:
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, state, force=force)
        ckptr.wait_until_finished()
        return
    named, _ = _flatten_with_paths(state)
    np.savez(path + ".npz", **{p: np.asarray(x) for p, x in named})


def _fill_from_like(stored: dict, like_raw: Any, source: str) -> Any:
    """Rebuild `like`'s structure from a path->array dict; missing leaves
    keep their `like` value (defaults), extra stored leaves are ignored."""
    named, treedef = _flatten_with_paths(like_raw)
    leaves, missing = [], []
    for p, l in named:
        if p in stored:
            leaves.append(jnp.asarray(stored[p]).astype(l.dtype))
        else:
            missing.append(p)
            leaves.append(l)
    if missing:
        warnings.warn(
            f"Checkpoint {source} predates state field(s) {missing}; "
            "restoring them from the provided `like` values.")
    extra = sorted(set(stored) - {p for p, _ in named})
    if extra:
        warnings.warn(
            f"Checkpoint {source} contains unknown field(s) {extra}; "
            "ignored.")
    return jax.tree_util.tree_unflatten(treedef, leaves)


def restore_state(path: str, like: Any) -> Any:
    """Restore a pytree saved by `save_state`.

    `like` provides the pytree structure/shapes/dtypes (e.g. a freshly
    reset state of the same env/batch); sharded targets restore sharded.
    Fields absent from the checkpoint (older-format saves) are filled from
    `like` with a warning instead of failing.
    """
    path = os.path.abspath(path)
    like_raw = _unwrap_keys(like)
    if _HAS_ORBAX:
        ckptr = ocp.StandardCheckpointer()
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, like_raw)
        try:
            restored = ckptr.restore(path, abstract)
        except Exception:
            # Structure mismatch (checkpoint from an older state layout):
            # re-read leaf-by-leaf, match on tree path, default-fill rest.
            raw = ckptr.restore(path)
            named = {p: np.asarray(x)
                     for p, x in _flatten_with_paths(raw)[0]}
            restored = _fill_from_like(named, like_raw, source=path)
        return _rewrap_keys(restored, like)
    data = np.load(path + ".npz")
    if all(k.startswith("arr_") for k in data.files):
        # Legacy positional format: only valid when the leaf count matches.
        leaves, treedef = jax.tree.flatten(like_raw)
        if len(data.files) != len(leaves):
            raise ValueError(
                f"Positional (legacy) checkpoint {path}.npz has "
                f"{len(data.files)} leaves but the target state has "
                f"{len(leaves)}; cannot restore safely.")
        restored = jax.tree.unflatten(treedef, [
            jnp.asarray(data[f"arr_{i}"]).astype(l.dtype)
            for i, l in enumerate(leaves)])
    else:
        restored = _fill_from_like(
            {k: data[k] for k in data.files}, like_raw,
            source=f"{path}.npz")
    return _rewrap_keys(restored, like)
