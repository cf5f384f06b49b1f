"""Batched sprite geometry: vertex transforms and point-in-polygon tests.

TPU-native replacement for the matplotlib Path machinery the reference uses
(/root/reference/spriteworld/sprite.py:96-133). Vertices are recomputed from
factors on demand — a tiny fused gather + rotate + add that XLA vectorizes
over sprites — instead of caching transformed paths in Python objects.

The containment test is the even-odd crossing-number rule, which agrees with
matplotlib's `Path.contains_point` on all our polygons (they are simple, i.e.
non-self-intersecting, including the concave stars and spokes).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from spriteworld_tpu import constants
from spriteworld_tpu.core import state as state_lib

_DEG2RAD = np.pi / 180.0

# Padded vertex bank as a host constant; jnp.asarray at use sites lets XLA
# embed it per-trace (it must NOT be cached as a traced value).
_BANK_HOST = constants.VERTEX_BANK


def vertex_bank() -> jnp.ndarray:
    """The padded vertex bank as a device constant f32[13, 30, 2]."""
    return jnp.asarray(_BANK_HOST)


def centered_vertices(factors: jnp.ndarray) -> jnp.ndarray:
    """Scaled+rotated (but untranslated) vertices for sprites [..., 10].

    Matches the reference `_reset_centered_path`: scale then rotate
    (sprite.py:96-101). Returns f32[..., MAX_VERTICES, 2].

    The rotation is applied elementwise on the VPU (not as a matmul): for
    2-vectors that is both faster than the MXU and keeps full f32 precision
    (TPU matmuls default to bf16 inputs).
    """
    shape_id = factors[..., state_lib.SHAPE].astype(jnp.int32)
    base = vertex_bank()[shape_id]  # [..., V, 2]
    scaled = base * factors[..., state_lib.SCALE][..., None, None]
    rad = factors[..., state_lib.ANGLE] * _DEG2RAD
    c = jnp.cos(rad)[..., None]
    s = jnp.sin(rad)[..., None]
    vx = scaled[..., 0]
    vy = scaled[..., 1]
    # CCW rotation, matching mpl Affine2D().rotate_deg.
    return jnp.stack([c * vx - s * vy, s * vx + c * vy], axis=-1)


def world_vertices(factors: jnp.ndarray) -> jnp.ndarray:
    """World-space vertices: centered vertices + position (sprite.py:128-133)."""
    pos = factors[..., None, 0:2]  # columns (X, Y)
    return centered_vertices(factors) + pos


def points_in_polygons(vertices: jnp.ndarray,
                       points: jnp.ndarray) -> jnp.ndarray:
    """Even-odd containment of points in closed polygons.

    Args:
      vertices: f32[..., V, 2] polygon vertices (padding slots must repeat an
        existing vertex so padded edges are degenerate — see constants.py).
      points: f32[..., 2] query points, broadcast against the polygon batch.

    Returns:
      bool[...] — True where the point lies inside the polygon.
    """
    px = points[..., 0]
    py = points[..., 1]
    x1 = vertices[..., 0]
    y1 = vertices[..., 1]
    x2 = jnp.roll(x1, -1, axis=-1)  # wrap edge V-1 -> 0 closes the polygon
    y2 = jnp.roll(y1, -1, axis=-1)
    py_ = py[..., None]
    straddles = (y1 > py_) != (y2 > py_)
    dy = y2 - y1
    # Guard the horizontal-edge division; such edges never straddle.
    t = (py_ - y1) / jnp.where(dy == 0.0, 1.0, dy)
    x_cross = x1 + t * (x2 - x1)
    crossings = jnp.sum(
        (straddles & (px[..., None] < x_cross)).astype(jnp.int32), axis=-1)
    return (crossings & 1) == 1


def sprites_containing_point(factors: jnp.ndarray,
                             point: jnp.ndarray) -> jnp.ndarray:
    """bool[K] — which sprites' polygons contain `point` (f32[2]).

    Engine analogue of looping `Sprite.contains_point` (sprite.py:113-115).
    """
    return points_in_polygons(world_vertices(factors), point)


def topmost_hit(hit_mask: jnp.ndarray, limit: jnp.ndarray):
    """Select the foreground-most live sprite from a hit mask.

    The reference scans `sprites[::-1]` and takes the first hit
    (action_spaces.py:77-81): with slot order = z-order that is the *highest*
    hit slot index below `limit`.

    Returns (index i32, any_hit bool). Index is 0 when there is no hit.
    """
    k = hit_mask.shape[-1]
    idx = jnp.arange(k)
    valid = hit_mask & (idx < limit)
    any_hit = jnp.any(valid, axis=-1)
    top = jnp.max(jnp.where(valid, idx, -1), axis=-1)
    return jnp.maximum(top, 0), any_hit


def out_of_frame(factors: jnp.ndarray, num_sprites: jnp.ndarray) -> jnp.ndarray:
    """True if any live sprite's center left [0,1]^2 (sprite.py:135-138)."""
    pos = factors[..., 0:2]  # columns (X, Y)
    k = factors.shape[-2]
    alive = jnp.arange(k) < num_sprites[..., None]
    escaped = jnp.any((pos < 0.0) | (pos > 1.0), axis=-1)
    return jnp.any(escaped & alive, axis=-1)
