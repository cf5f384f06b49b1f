"""Traceable color-space conversions.

Rebuild of /root/reference/spriteworld/renderers/color_maps.py:26-28, but
vectorized: converts [..., 3] color arrays inside jit instead of per-sprite
Python tuples through colorsys.
"""

from __future__ import annotations

import jax.numpy as jnp


def hsv_to_rgb(hsv: jnp.ndarray) -> jnp.ndarray:
    """Vectorized HSV -> RGB in [0, 255], matching colorsys + uint8 cast.

    The reference computes `(255 * colorsys.hsv_to_rgb(*c)).astype(uint8)`
    (truncation); callers should truncate the returned floats to uint8.
    """
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    i = i.astype(jnp.int32) % 6
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    # Channel tables indexed by sector i (colorsys's 6-way branch).
    r = jnp.choose(i, [v, q, p, p, t, v], mode="clip")
    g = jnp.choose(i, [t, v, v, q, p, p], mode="clip")
    b = jnp.choose(i, [p, p, t, v, v, q], mode="clip")
    return 255.0 * jnp.stack([r, g, b], axis=-1)


def identity_255(colors: jnp.ndarray) -> jnp.ndarray:
    """Pass-through for colors already expressed in [0, 255]."""
    return colors
