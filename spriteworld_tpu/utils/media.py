"""Episode recording and GIF export.

The reference ships demo GIFs in its README (/root/reference/README.md
image links) but no code to make them; these helpers close that gap for
the batched engine: roll out one env lane with image observations and
write the frames as an animated GIF (PIL, already a dependency of the
parity test stack).
"""

from __future__ import annotations

import weakref
from typing import Optional

import jax
import numpy as np

# jax.jit(bound_method) yields a fresh wrapper (own compile cache) each
# call; cache the jitted reset/step per env so recording several episodes
# (e.g. one per checkpoint) compiles only once.
_JITTED = weakref.WeakKeyDictionary()


def _jitted(env):
    if env not in _JITTED:
        _JITTED[env] = (jax.jit(env.reset_batch), jax.jit(env.step_batch))
    return _JITTED[env]


def record_episode(env, key, max_steps: int = 100,
                   obs_key: str = "image", policy=None) -> np.ndarray:
    """Roll out one env lane; returns stacked frames u8[T, H, W, 3].

    Runs the batched engine with B=1 (the single-lane view the demo UI
    uses), stepping until the episode's LAST timestep or `max_steps`.
    `policy(key, state) -> action[1, ...]` defaults to the env's uniform
    random sampler (the reference RandomAgent, example_run_loop.py:46-59).
    """
    import jax.numpy as jnp

    reset, step = _jitted(env)
    state, ts = reset(jax.random.split(key, 1))
    frames = [np.asarray(ts.observation[obs_key][0])]
    for i in range(max_steps):
        key = jax.random.fold_in(key, i)
        if policy is None:
            action = jax.vmap(env.sample_action)(jax.random.split(key, 1))
        else:
            action = policy(key, state)
        state, ts = step(state, jnp.asarray(action))
        frames.append(np.asarray(ts.observation[obs_key][0]))
        if bool(np.asarray(ts.last())[0]):
            break
    return np.stack(frames)


def save_gif(frames: np.ndarray, path: str, fps: float = 10,
             scale: Optional[int] = None) -> str:
    """Write u8[T, H, W, 3] frames as an animated GIF; returns `path`.

    `scale` integer-upscales with nearest-neighbor (64x64 observations
    are small; the reference demos render at 256).
    """
    from PIL import Image

    frames = np.asarray(frames)
    if frames.ndim != 4 or frames.shape[-1] != 3:
        raise ValueError(f"expected u8[T, H, W, 3], got {frames.shape}")
    if scale:
        frames = frames.repeat(scale, axis=1).repeat(scale, axis=2)
    imgs = [Image.fromarray(f) for f in frames.astype(np.uint8)]
    imgs[0].save(path, save_all=True, append_images=imgs[1:],
                 duration=int(1000 / fps), loop=0)
    return path
