"""PIL-matching Lanczos downsampling as two small dense matmuls.

The reference downsamples its supersampled canvas with
``Image.resize(image_size, resample=Image.ANTIALIAS)``
(/root/reference/spriteworld/renderers/pil_renderer.py:84), i.e. Pillow's
separable Lanczos-3 filter in 8-bit fixed point: a horizontal pass, a clip
to uint8, then a vertical pass. This module reproduces that pipeline in a
TPU-friendly form:

  * Coefficients are precomputed on the host in float64 exactly following
    Pillow's ``precompute_coeffs`` (window placement, edge clipping,
    normalization) and then quantized to Pillow's 22-bit fixed point
    (``normalize_coeffs_8bpc``), so the filter taps are *bit-identical* to
    Pillow's.
  * Each pass is a dense [out, in] matrix applied with f32 HIGHEST-precision
    matmuls. Pillow accumulates in int32 and rounds via
    ``clip8((1 << 21) + sum) >> 22``; with the quantized taps that equals
    ``clip(floor(sum_f + 0.5), 0, 255)`` where ``sum_f = sum(k/2^22 * p)``.
    The f32 evaluation of ``sum_f`` (values <= ~324, ulp ~2e-5) matches the
    exact rational to far better than the 0.5 rounding margin, so outputs
    agree with Pillow within at most 1/255 per pass and are equal on
    essentially all pixels (pinned by tests/test_render.py).

Matrices are tiny ([64, 320] at the COBRA-canonical anti_aliasing=5) and are
cached per (in_size, out_size).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# Pillow Resample.c: PRECISION_BITS = 32 - 8 - 2.
_PRECISION_BITS = 22
_LANCZOS_SUPPORT = 3.0


def _lanczos(x: np.ndarray) -> np.ndarray:
    """Pillow's lanczos_filter: sinc(x) * sinc(x/3) on [-3, 3)."""
    out = np.sinc(x) * np.sinc(x / 3.0)
    return np.where((x >= -3.0) & (x < 3.0), out, 0.0)


@functools.lru_cache(maxsize=None)
def pil_lanczos_matrix(in_size: int, out_size: int) -> np.ndarray:
    """f32[out_size, in_size] of Pillow-quantized Lanczos taps.

    Follows Pillow's precompute_coeffs (Resample.c) with in0=0, in1=in_size,
    then normalize_coeffs_8bpc: each tap is round-half-away(k * 2^22) / 2^22.
    """
    scale = in_size / out_size
    filterscale = max(scale, 1.0)
    support = _LANCZOS_SUPPORT * filterscale
    ss = 1.0 / filterscale

    mat = np.zeros((out_size, in_size), np.float64)
    for xx in range(out_size):
        center = (xx + 0.5) * scale
        xmin = max(int(center - support + 0.5), 0)
        xmax = min(int(center + support + 0.5), in_size)
        taps = _lanczos(
            (np.arange(xmin, xmax) - center + 0.5) * ss)
        total = taps.sum()
        if total != 0.0:
            taps = taps / total
        # Fixed-point quantization (round half away from zero).
        q = np.where(taps < 0,
                     np.trunc(taps * (1 << _PRECISION_BITS) - 0.5),
                     np.trunc(taps * (1 << _PRECISION_BITS) + 0.5))
        mat[xx, xmin:xmax] = q / (1 << _PRECISION_BITS)
    return mat.astype(np.float32)


def _clip8(x: jnp.ndarray) -> jnp.ndarray:
    """Pillow clip8 on a float accumulator: floor(x + 0.5) into [0, 255]."""
    return jnp.clip(jnp.floor(x + 0.5), 0.0, 255.0)


def pil_resize_lanczos(canvas: jnp.ndarray, out_h: int,
                       out_w: int) -> jnp.ndarray:
    """Pillow ANTIALIAS resize of f32[H, W, C] (integer-valued, 0..255).

    Horizontal pass, uint8 rounding, then vertical pass — Pillow's order
    (ImagingResampleInner resizes horizontally first). Returns f32[out_h,
    out_w, C] with integer values in [0, 255].
    """
    hc, wc, _ = canvas.shape
    kw = jnp.asarray(pil_lanczos_matrix(wc, out_w))  # [out_w, wc]
    kh = jnp.asarray(pil_lanczos_matrix(hc, out_h))  # [out_h, hc]
    hi = jax.lax.Precision.HIGHEST
    t = _clip8(jnp.einsum("ow,hwc->hoc", kw, canvas, precision=hi))
    return _clip8(jnp.einsum("oh,hwc->owc", kh, t, precision=hi))
