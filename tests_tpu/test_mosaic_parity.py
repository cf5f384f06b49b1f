"""Mosaic-compiled Pallas rasterizer vs the XLA rasterizer, on-chip.

The interpret-mode tests (tests/test_rasterize_pallas.py) validate kernel
logic but cannot catch Mosaic lowering differences — SMEM scalar loads,
`pl.when` gating, the lane-packed canvas layout, MXU matmul precision. This
suite compiles the kernel for the real TPU and pins every code path of
ops/rasterize_pallas.py against the XLA reference rasterizer (itself pinned
bit-exactly against PIL in tests/test_render.py):

  * packed lane canvas: aa=1, wc < 128           (64x64, aa=1)
  * scene-per-program transposed canvas (the AA>1 TPU path: streamed
    scanline tables, dynamic sublane/lane windows, in-kernel Lanczos)
    — the "auto" aa>1 cases
  * legacy row-strip grid                        (kernel_mode="strips")
  * both fill modes (pil_exact True/False), box + Lanczos downsample

At aa>1 all cases allow +-1 at rounding boundaries (downsample
accumulation-order ulps vs the XLA einsum); aa=1 is bit-exact.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from spriteworld_tpu.core import state as state_lib
from spriteworld_tpu.ops import rasterize, rasterize_pallas


def _scene_batch(seed, b=4, kmax=8):
    rng = np.random.RandomState(seed)
    f = np.tile(state_lib.DEFAULT_FACTORS, (b, kmax, 1)).astype(np.float32)
    f[..., state_lib.X] = rng.uniform(0.1, 0.9, (b, kmax))
    f[..., state_lib.Y] = rng.uniform(0.1, 0.9, (b, kmax))
    f[..., state_lib.SHAPE] = rng.randint(1, 13, (b, kmax))
    f[..., state_lib.ANGLE] = rng.uniform(0, 360, (b, kmax))
    f[..., state_lib.SCALE] = rng.uniform(0.08, 0.3, (b, kmax))
    f[..., 5:8] = rng.randint(0, 256, (b, kmax, 3))
    nums = rng.randint(1, kmax + 1, b).astype(np.int32)
    return jnp.asarray(f), jnp.asarray(nums)


CASES = [
    # (image_size, aa, pil_exact, downsample, kernel_mode) -> path
    ((64, 64), 1, True, "auto", "auto"),    # packed lane canvas, exact
    ((64, 64), 1, False, "auto", "auto"),   # packed lane canvas, centroid
    ((32, 32), 2, True, "auto", "auto"),    # scene kernel, small canvas
    ((32, 32), 2, False, "auto", "auto"),   # scene kernel, centroid
    ((64, 64), 5, True, "auto", "auto"),    # scene kernel + Lanczos (COBRA)
    ((64, 64), 5, False, "auto", "auto"),   # scene kernel, centroid + box
    ((64, 64), 5, True, "box", "auto"),     # scene kernel, exact + box
    ((64, 64), 5, True, "auto", "strips"),  # legacy strip grid, Lanczos
    ((64, 64), 5, False, "auto", "strips"),  # legacy strip grid, centroid
    ((64, 64), 1, True, "auto", "scene"),   # explicit scene at aa=1
]


@pytest.mark.parametrize(
    "image_size,aa,pil_exact,downsample,kernel_mode", CASES)
@pytest.mark.parametrize("seed", [0, 1])
def test_mosaic_matches_xla(image_size, aa, pil_exact, downsample,
                            kernel_mode, seed):
    factors, nums = _scene_batch(seed)
    kwargs = dict(image_size=image_size, anti_aliasing=aa,
                  pil_exact=pil_exact, downsample=downsample)
    got = np.asarray(rasterize_pallas.render_rgb_batch(
        factors, nums, interpret=False, kernel_mode=kernel_mode,
        **kwargs)).astype(np.int32)
    want = np.stack([
        np.asarray(rasterize.render_rgb(factors[i], nums[i], **kwargs))
        for i in range(factors.shape[0])]).astype(np.int32)
    if aa == 1:
        np.testing.assert_array_equal(got, want)
    else:
        # Downsample matmuls accumulate in a different order than the XLA
        # einsum; +-1 can appear exactly at rounding boundaries.
        assert np.abs(got - want).max() <= 1


def test_mosaic_hsv_and_bg():
    from spriteworld_tpu.utils import colors as color_maps

    factors, nums = _scene_batch(5)
    factors = factors.at[..., 5:8].set(
        jnp.asarray(np.random.RandomState(5).uniform(0, 1, (4, 8, 3)),
                    jnp.float32))
    kwargs = dict(image_size=(64, 64), anti_aliasing=1,
                  bg_color=(10, 20, 30), color_to_rgb=color_maps.hsv_to_rgb)
    got = np.asarray(rasterize_pallas.render_rgb_batch(
        factors, nums, interpret=False, **kwargs))
    want = np.stack([
        np.asarray(rasterize.render_rgb(factors[i], nums[i], **kwargs))
        for i in range(factors.shape[0])])
    np.testing.assert_array_equal(got, want)
