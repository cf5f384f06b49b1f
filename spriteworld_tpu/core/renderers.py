"""Renderers: traceable observation functions over the factor state.

Rebuild of /root/reference/spriteworld/renderers/. Each renderer exposes
``render(factors, num_sprites, success) -> pytree of arrays`` (traceable) and
``observation_spec() -> pytree of jax.ShapeDtypeStruct``. The dm_env adapter
maps these to reference-style observation formats (list-of-dicts, numpy
scalars) at the host boundary.

  * SpriteFactors  — dense [max_sprites, F] factor slab + live mask
    (reference handcrafted.py:29-90 returns a list of per-sprite dicts; the
    batched engine keeps the padded array form).
  * SpritePassthrough — the raw packed factor matrix + count
    (handcrafted.py:85-112 passes the Sprite list through).
  * Success — task success flag (handcrafted.py:115-131).
  * ImageRenderer — RGB pixels via the XLA/Pallas rasterizer
    (pil_renderer.py:30-94). Accepts color_to_rgb='hsv' | None | callable.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from spriteworld_tpu.core import state as state_lib
from spriteworld_tpu.ops import rasterize
from spriteworld_tpu.utils import colors as color_maps


class AbstractRenderer:
    """Interface: render(factors, num_sprites, success) + observation_spec."""

    max_sprites: Optional[int] = None  # set by the environment at bind time

    def bind(self, max_sprites: int):
        """Called by the environment so specs can be static."""
        self.max_sprites = max_sprites
        return self

    def render(self, factors, num_sprites, success):
        raise NotImplementedError

    def render_batch(self, factors, num_sprites, success):
        """Batched render: factors[B, K, F], num[B], success[B].

        Default is a vmap of `render`; renderers with a dedicated batched
        fast path (the Pallas image kernel) override this.
        """
        return jax.vmap(self.render)(factors, num_sprites, success)

    def observation_spec(self):
        raise NotImplementedError


class SpriteFactors(AbstractRenderer):
    """Selected factor columns as a dense array + live mask."""

    def __init__(self, factors: Sequence[str] = state_lib.FACTOR_NAMES):
        if not set(factors).issubset(set(state_lib.FACTOR_NAMES)):
            raise ValueError(
                f"Factors have to belong to {state_lib.FACTOR_NAMES}.")
        self._factors = tuple(factors)
        self._columns = np.asarray(
            [state_lib.FACTOR_INDEX[f] for f in factors], dtype=np.int32)

    @property
    def factor_names(self):
        return self._factors

    def render(self, factors, num_sprites, success):
        del success
        k = factors.shape[-2]
        return {
            "factors": factors[..., jnp.asarray(self._columns)],
            "mask": jnp.arange(k) < num_sprites,
        }

    def observation_spec(self):
        k = self.max_sprites
        return {
            "factors": jax.ShapeDtypeStruct(
                (k, len(self._factors)), jnp.float32),
            "mask": jax.ShapeDtypeStruct((k,), jnp.bool_),
        }


class SpritePassthrough(AbstractRenderer):
    """The full packed factor state (engine analogue of the Sprite list)."""

    def render(self, factors, num_sprites, success):
        del success
        return {"factors": factors, "num_sprites": num_sprites}

    def observation_spec(self):
        k = self.max_sprites
        return {
            "factors": jax.ShapeDtypeStruct(
                (k, state_lib.NUM_FACTORS), jnp.float32),
            "num_sprites": jax.ShapeDtypeStruct((), jnp.int32),
        }


class Success(AbstractRenderer):
    """Task success flag as a boolean observation."""

    def render(self, factors, num_sprites, success):
        del factors, num_sprites
        return success

    def observation_spec(self):
        return jax.ShapeDtypeStruct((), jnp.bool_)


def _resolve_color_map(color_to_rgb) -> Optional[Callable]:
    if color_to_rgb is None:
        return None
    if callable(color_to_rgb):
        return color_to_rgb
    if color_to_rgb == "hsv":
        return color_maps.hsv_to_rgb
    raise ValueError(f"Unknown color_to_rgb: {color_to_rgb!r}")


class ImageRenderer(AbstractRenderer):
    """Anti-aliased RGB rendering of the scene.

    Drop-in functional analogue of the reference PILRenderer
    (pil_renderer.py:30-94): supersampled canvas, back-to-front polygon
    painting, vertical flip to math coordinates.
    """

    def __init__(self,
                 image_size: Tuple[int, int] = (64, 64),
                 anti_aliasing: int = 1,
                 bg_color: Optional[Tuple[int, int, int]] = None,
                 color_to_rgb: Union[None, str, Callable] = None,
                 use_pallas: Union[bool, str] = "auto",
                 pil_exact: Union[bool, str] = "auto",
                 downsample: str = "auto",
                 kernel_mode: str = "auto"):
        """By default observations are bit-exact vs the reference PILRenderer
        at every anti_aliasing: pil_exact="auto" resolves to the Pillow
        scanline fill, and downsample="auto" then picks the PIL-quantized
        Lanczos filter (ops/resample.py) matching resize(ANTIALIAS)
        (pil_renderer.py:84). Pass pil_exact=False for the fast mode:
        centroid sampling + box average — at anti_aliasing>1 the differences
        are sub-pixel and edge-local (the tolerance class the reference's
        own AA tests accept, pil_renderer_test.py:68-72) and it is ~2-4x
        cheaper. downsample="box"/"lanczos" forces a filter.

        kernel_mode selects the Pallas fill strategy ("scene", "strips", or
        "auto"; see ops/rasterize_pallas.py). With "auto", if the preferred
        kernel fails to trace/compile, the renderer logs one warning and
        permanently falls back to the bounded-VMEM "strips" kernel for this
        instance — one bad kernel can't take down the product path."""
        self._image_size = tuple(image_size)
        self._anti_aliasing = int(anti_aliasing)
        if self._anti_aliasing < 1 or min(self._image_size) < 1:
            raise ValueError(
                f"image_size {image_size} and anti_aliasing {anti_aliasing} "
                "must be positive.")
        self._bg_color = bg_color
        self._color_to_rgb = _resolve_color_map(color_to_rgb)
        self._use_pallas = use_pallas
        if pil_exact == "auto":
            pil_exact = True
        self._pil_exact = bool(pil_exact)
        self._downsample = downsample
        if kernel_mode not in ("auto", "scene", "strips"):
            raise ValueError(f"Unknown kernel_mode: {kernel_mode!r}")
        self._kernel_mode = kernel_mode

    @property
    def image_size(self):
        return self._image_size

    def _pallas_call(self, fn, *args):
        """Invoke a Pallas render fn with kernel-mode auto-fallback.

        Scope: the fallback catches kernel TRACE/LOWERING failures in
        every context — eager or while tracing under an outer jit
        (Pallas kernels are traced at call time, which is how the known
        failure class surfaces). A failure at an outer jit's late Mosaic
        COMPILE stage happens after this frame returns and cannot be
        intercepted here; probing it eagerly would cost a full extra
        kernel compile per renderer instance.
        """
        kwargs = dict(
            image_size=self._image_size,
            anti_aliasing=self._anti_aliasing,
            bg_color=self._bg_color,
            color_to_rgb=self._color_to_rgb,
            pil_exact=self._pil_exact,
            downsample=self._downsample)
        mode = self._kernel_mode
        try:
            return fn(*args, kernel_mode=mode, **kwargs)
        except Exception as preferred_err:  # noqa: BLE001 — see below
            if mode != "auto":
                raise  # an explicit mode is the user's call; surface it
            # Retry on the bounded-VMEM strips kernel. Pin it ONLY if the
            # retry succeeds: if strips fails too, the error is not the
            # kernel's (bad inputs, OOM, ...) — surface the original and
            # leave the mode on "auto" so a later valid call still gets
            # the preferred kernel.
            try:
                out = fn(*args, kernel_mode="strips", **kwargs)
            except Exception:
                raise preferred_err
            import logging

            logging.getLogger(__name__).warning(
                "ImageRenderer: preferred Pallas kernel failed to "
                "trace/compile; falling back to kernel_mode='strips' for "
                "this renderer.", exc_info=True)
            self._kernel_mode = "strips"
            return out

    def _pallas_enabled(self) -> bool:
        if self._use_pallas == "auto":
            # Measured on v5e: the Pallas kernel wins on big supersampled
            # canvases (count-limited edge loops + row skipping); on small
            # ones (anti_aliasing=1) XLA's fully-fused brute force wins and
            # fuses into the surrounding step program.
            h, w = self._image_size
            big_canvas = h * w * self._anti_aliasing ** 2 > 16384
            return jax.default_backend() == "tpu" and big_canvas
        return bool(self._use_pallas)

    def render(self, factors, num_sprites, success):
        del success
        if self._pallas_enabled():
            from spriteworld_tpu.ops import rasterize_pallas

            return self._pallas_call(
                rasterize_pallas.render_rgb, factors, num_sprites)
        return rasterize.render_rgb(
            factors, num_sprites,
            image_size=self._image_size,
            anti_aliasing=self._anti_aliasing,
            bg_color=self._bg_color,
            color_to_rgb=self._color_to_rgb,
            pil_exact=self._pil_exact,
            downsample=self._downsample)

    def render_batch(self, factors, num_sprites, success):
        del success
        if self._pallas_enabled():
            from spriteworld_tpu.ops import rasterize_pallas

            return self._pallas_call(
                rasterize_pallas.render_rgb_batch, factors, num_sprites)
        return jax.vmap(lambda f, n: rasterize.render_rgb(
            f, n,
            image_size=self._image_size,
            anti_aliasing=self._anti_aliasing,
            bg_color=self._bg_color,
            color_to_rgb=self._color_to_rgb,
            pil_exact=self._pil_exact,
            downsample=self._downsample))(factors, num_sprites)

    def observation_spec(self):
        return jax.ShapeDtypeStruct(
            self._image_size + (3,), jnp.uint8)


# Familiar alias: reference users construct `PILRenderer` (common.py:30-38).
PILRenderer = ImageRenderer
