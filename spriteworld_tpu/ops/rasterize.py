"""XLA polygon rasterizer: painter's-algorithm scene rendering.

Reference behavior being reproduced (/root/reference/spriteworld/renderers/
pil_renderer.py:66-91): draw filled sprite polygons back-to-front on an
anti_aliasing-supersampled canvas, downsample, and flip vertically to math
coordinates.

TPU-native formulation: for every supersampled pixel center, run an even-odd
crossing-number test against each sprite's polygon and keep the color of the
*last* (foreground-most) live sprite containing it — exactly painter's
occlusion without any scatter. The per-sprite loop is a static Python loop
(K is small and static), producing one fused elementwise XLA kernel over the
pixel grid; the downsample is a box mean-pool.

Parity notes (SURVEY.md §7): exact pixel parity with PIL is defined at
anti_aliasing=1 (PIL's LANCZOS at scale 1 is the identity); at AA>1 PIL uses
a Lanczos filter while we use a box filter, giving bounded differences along
polygon edges only — the reference's own tests already tolerate AA
variation (tests/renderers/pil_renderer_test.py:68-72).

This module is the portable XLA path; `rasterize_pallas.py` provides the
hand-tiled TPU kernel with identical semantics.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from spriteworld_tpu.ops import geometry


def pixel_centers(height: int, width: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Math-coordinate pixel centers of the final (flipped) image.

    Row r of the output image covers y in [(H-1-r)/H, (H-r)/H) — the flipud
    of PIL's top-left origin (pil_renderer.py:86-90). Returns (px[W], py[H]).
    """
    px = (jnp.arange(width, dtype=jnp.float32) + 0.5) / width
    py = (height - 0.5 - jnp.arange(height, dtype=jnp.float32)) / height
    return px, py


def _edges(verts_k: jnp.ndarray):
    """Edge endpoints of one polygon: (x1, y1, x2, y2), each [V]."""
    x1 = verts_k[:, 0]
    y1 = verts_k[:, 1]
    return x1, y1, jnp.roll(x1, -1), jnp.roll(y1, -1)


def render_rgb(factors: jnp.ndarray,
               num_sprites: jnp.ndarray,
               *,
               image_size: Tuple[int, int] = (64, 64),
               anti_aliasing: int = 1,
               bg_color: Optional[Tuple[int, int, int]] = None,
               color_to_rgb: Optional[Callable] = None) -> jnp.ndarray:
    """Render one scene to u8[H, W, 3].

    Args:
      factors: f32[K, 10] packed factor matrix.
      num_sprites: i32 scalar live count.
      image_size: (H, W) of the output.
      anti_aliasing: supersampling factor (canvas is AA*H x AA*W).
      bg_color: background RGB (default black), ints in [0, 255].
      color_to_rgb: traceable [K, 3] -> [K, 3] map producing values in
        [0, 255] (e.g. utils.colors.hsv_to_rgb); identity if None.
    """
    h, w = image_size
    aa = anti_aliasing
    hc, wc = h * aa, w * aa

    verts = geometry.world_vertices(factors)  # [K, V, 2]
    k = factors.shape[0]

    colors = factors[:, 5:8]  # (c0, c1, c2)
    if color_to_rgb is not None:
        colors = color_to_rgb(colors)
    # PIL truncates to uint8 after the color map (color_maps.py:28).
    colors = jnp.clip(colors, 0, 255).astype(jnp.uint8).astype(jnp.float32)

    bg = jnp.asarray(
        bg_color if bg_color is not None else (0, 0, 0), jnp.float32)

    px, py = pixel_centers(hc, wc)
    pxg = px[None, :]  # [1, Wc]
    pyg = py[:, None]  # [Hc, 1]

    canvas = jnp.broadcast_to(bg, (hc, wc, 3))
    # Painter's algorithm: ascending slot index = back-to-front.
    for i in range(k):
        x1, y1, x2, y2 = _edges(verts[i])
        inside = jnp.zeros((hc, wc), dtype=bool)
        for e in range(x1.shape[0]):
            straddles = (y1[e] > pyg) != (y2[e] > pyg)
            dy = y2[e] - y1[e]
            t = (pyg - y1[e]) / jnp.where(dy == 0.0, 1.0, dy)
            xc = x1[e] + t * (x2[e] - x1[e])
            inside = inside ^ (straddles & (pxg < xc))
        live = i < num_sprites
        canvas = jnp.where((inside & live)[..., None], colors[i], canvas)

    if aa > 1:
        canvas = canvas.reshape(h, aa, w, aa, 3).mean(axis=(1, 3))
    return jnp.round(canvas).astype(jnp.uint8)
