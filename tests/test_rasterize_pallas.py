"""Pallas rasterizer vs the XLA reference rasterizer.

The XLA path (ops/rasterize.py) is itself pinned bit-exactly against PIL at
anti_aliasing=1 (tests/test_render.py), so agreement here transitively gives
PIL parity for the kernel. Runs in Pallas interpreter mode on the CPU test
platform; on TPU the same kernel compiles via Mosaic.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spriteworld_tpu.core import state as state_lib
from spriteworld_tpu.ops import rasterize, rasterize_pallas
from spriteworld_tpu.utils import colors as color_maps


def random_scene(seed, k=6, kmax=8):
    rng = np.random.RandomState(seed)
    factors = np.tile(state_lib.DEFAULT_FACTORS, (kmax, 1))
    factors[:, state_lib.X] = rng.uniform(0.1, 0.9, kmax)
    factors[:, state_lib.Y] = rng.uniform(0.1, 0.9, kmax)
    factors[:, state_lib.SHAPE] = rng.randint(1, 13, kmax)
    factors[:, state_lib.ANGLE] = rng.uniform(0, 360, kmax)
    factors[:, state_lib.SCALE] = rng.uniform(0.08, 0.3, kmax)
    factors[:, 5:8] = rng.randint(0, 256, (kmax, 3))
    return jnp.asarray(factors, jnp.float32), jnp.int32(k)


@pytest.mark.parametrize("pil_exact", [True, False])
@pytest.mark.parametrize("aa", [1, 2])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_matches_xla_rasterizer(pil_exact, aa, seed):
    factors, num = random_scene(seed)
    want = rasterize.render_rgb(
        factors, num, image_size=(32, 32), anti_aliasing=aa,
        pil_exact=pil_exact)
    got = rasterize_pallas.render_rgb(
        factors, num, image_size=(32, 32), anti_aliasing=aa,
        pil_exact=pil_exact, interpret=True)
    want = np.asarray(want).astype(np.int32)
    got = np.asarray(got).astype(np.int32)
    if aa == 1:
        np.testing.assert_array_equal(got, want)
    else:
        # Box means accumulate in a different order (matmul); allow +-1 at
        # rounding boundaries.
        assert np.abs(got - want).max() <= 1


@pytest.mark.parametrize("pil_exact", [True, False])
@pytest.mark.parametrize("aa", [1, 2, 5])
@pytest.mark.parametrize("seed", [0, 1])
def test_scene_kernel_matches_xla(pil_exact, aa, seed):
    """Scene-per-program kernel (the AA>1 TPU path; auto picks it only on
    TPU, so force it here — incl. aa=1, where an explicit "scene" must
    override the packed-canvas dispatch). Fill masks are exact; at aa>1
    the in-kernel downsample accumulates in a different order than the
    XLA einsum, so +-1 at rounding boundaries; aa=1 is bit-exact."""
    factors, num = random_scene(seed)
    want = rasterize.render_rgb(
        factors, num, image_size=(32, 32), anti_aliasing=aa,
        pil_exact=pil_exact)
    got = rasterize_pallas.render_rgb(
        factors, num, image_size=(32, 32), anti_aliasing=aa,
        pil_exact=pil_exact, interpret=True, kernel_mode="scene")
    want = np.asarray(want).astype(np.int32)
    got = np.asarray(got).astype(np.int32)
    if aa == 1:
        np.testing.assert_array_equal(got, want)
    else:
        assert np.abs(got - want).max() <= 1


def test_bg_and_colormap_and_occlusion():
    factors, _ = random_scene(7, kmax=4)
    # Two overlapping sprites: slot order is z-order.
    factors = factors.at[0, 0:2].set(jnp.asarray([0.5, 0.5]))
    factors = factors.at[1, 0:2].set(jnp.asarray([0.52, 0.5]))
    factors = factors.at[:, state_lib.SCALE].set(0.4)
    factors = factors.at[:2, 5:8].set(
        jnp.asarray([[0.9, 1.0, 1.0], [0.3, 1.0, 1.0]]))
    num = jnp.int32(2)
    kwargs = dict(image_size=(24, 24), anti_aliasing=1,
                  bg_color=(10, 20, 30), color_to_rgb=color_maps.hsv_to_rgb)
    want = rasterize.render_rgb(factors, num, **kwargs)
    got = rasterize_pallas.render_rgb(
        factors, num, interpret=True, **kwargs)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_num_sprites_masks_dead_slots():
    factors, _ = random_scene(3)
    a = rasterize_pallas.render_rgb(
        factors, jnp.int32(2), image_size=(16, 16), interpret=True)
    z = jnp.zeros_like(factors)
    b = rasterize_pallas.render_rgb(
        factors.at[2:].set(z[2:]), jnp.int32(2), image_size=(16, 16),
        interpret=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("pil_exact", [True, False])
def test_batched_stacking_matches_single(pil_exact):
    """render_rgb_batch packs several envs per program; results match the
    one-scene path exactly (the stacked edge tables are just shifted)."""
    scenes = [random_scene(s, k=3 + (s % 4)) for s in range(8)]
    factors = jnp.stack([f for f, _ in scenes])
    nums = jnp.stack([jnp.int32(3 + (s % 4)) for s in range(8)])
    batched = rasterize_pallas.render_rgb_batch(
        factors, nums, image_size=(16, 16), anti_aliasing=1,
        pil_exact=pil_exact, interpret=True)
    for i, (f, _) in enumerate(scenes):
        single = rasterize.render_rgb(
            f, nums[i], image_size=(16, 16), anti_aliasing=1,
            pil_exact=pil_exact)
        np.testing.assert_array_equal(
            np.asarray(batched[i]), np.asarray(single), err_msg=f"env {i}")


def test_vmap_batches_over_scenes():
    scenes = [random_scene(s) for s in range(3)]
    factors = jnp.stack([f for f, _ in scenes])
    nums = jnp.stack([n for _, n in scenes])
    fn = functools.partial(
        rasterize_pallas.render_rgb, image_size=(16, 16), anti_aliasing=2,
        interpret=True)
    batched = jax.vmap(lambda f, n: fn(f, n))(factors, nums)
    for i, (f, n) in enumerate(scenes):
        np.testing.assert_array_equal(
            np.asarray(batched[i]), np.asarray(fn(f, n)))


@pytest.mark.parametrize("pil_exact", [True, False])
@pytest.mark.parametrize("scale_range", [(0.02, 0.1), (0.1, 0.35)],
                         ids=["tiny", "normal"])
def test_scene_fastok_adversarial_fuzz(pil_exact, scale_range):
    """Adversarial oracle for the single-interval fast path: the scene
    kernel must stay pixel-equivalent to the XLA rasterizer on heavily
    truncation-degenerate sprites (tiny scales collapse edges to
    horizontal runs and merge vertices — exactly the corners where
    `_scene_fastok`'s geometric soundness analysis could over-approximate
    and silently skip needed per-edge work). A single wrong supersample
    at aa=5 shifts the box average by ~10 levels, so the +-1 downsample
    tolerance still catches any fill-mask error."""
    b, kmax = 48, 6
    rng = np.random.RandomState(hash(scale_range) % 2**31)
    factors = np.tile(state_lib.DEFAULT_FACTORS, (b, kmax, 1))
    factors[..., state_lib.X] = rng.uniform(0.1, 0.9, (b, kmax))
    factors[..., state_lib.Y] = rng.uniform(0.1, 0.9, (b, kmax))
    factors[..., state_lib.SHAPE] = rng.randint(1, 13, (b, kmax))
    factors[..., state_lib.ANGLE] = rng.uniform(0, 360, (b, kmax))
    factors[..., state_lib.SCALE] = rng.uniform(*scale_range, (b, kmax))
    factors[..., 5:8] = rng.randint(0, 256, (b, kmax, 3))
    factors = jnp.asarray(factors, jnp.float32)
    nums = jnp.asarray(rng.randint(0, kmax + 1, b), jnp.int32)

    kw = dict(image_size=(32, 32), anti_aliasing=5, pil_exact=pil_exact,
              downsample="box")
    want = jax.vmap(functools.partial(rasterize.render_rgb, **kw))(
        factors, nums)
    got = rasterize_pallas.render_rgb_batch(
        factors, nums, interpret=True, kernel_mode="scene", **kw)

    # Airtight fast-path oracle: the SAME kernel with the fast path
    # force-disabled must be bit-identical — any `_scene_fastok`
    # over-approximation flips fill-mask pixels here with zero tolerance.
    orig = rasterize_pallas._scene_fastok
    rasterize_pallas._scene_fastok = \
        lambda edges, gymax, hc, pe: jnp.zeros(edges.shape[:2], bool)
    try:
        rasterize_pallas.render_rgb_batch.clear_cache()
        slow = rasterize_pallas.render_rgb_batch(
            factors, nums, interpret=True, kernel_mode="scene", **kw)
    finally:
        rasterize_pallas._scene_fastok = orig
        rasterize_pallas.render_rgb_batch.clear_cache()
    np.testing.assert_array_equal(np.asarray(got), np.asarray(slow))

    # Sanity vs the XLA rasterizer: XLA:CPU FMA-contracts one path's xi
    # by 1 ulp in rare overlap rows (pre-existing, CPU-only; the TPU
    # compiled paths agree bit-exactly), so allow a small, rare residual.
    diff = np.abs(np.asarray(want).astype(np.int32)
                  - np.asarray(got).astype(np.int32))
    assert diff.max() <= 3, f"max diff {diff.max()} at {np.argwhere(diff > 1)[:5]}"
    assert (diff > 1).mean() < 1e-4


def test_scene_fastok_fires_for_workload_shapes():
    """Perf-property guard: the single-interval predicate must accept the
    convex COBRA/bench shapes at typical poses (the recorded AA=5 numbers
    depend on it) and reject multi-span stars/spokes. A silent predicate
    regression would not change any pixel — only the speed."""
    from spriteworld_tpu import constants

    hc = wc = 320
    rng = np.random.RandomState(0)

    def fastok_for(shape_name, n=64):
        sid = constants.shape_id(shape_name)
        factors = np.tile(state_lib.DEFAULT_FACTORS, (n, 1, 1))
        factors[..., state_lib.X] = rng.uniform(0.2, 0.8, (n, 1))
        factors[..., state_lib.Y] = rng.uniform(0.2, 0.8, (n, 1))
        factors[..., state_lib.SHAPE] = sid
        factors[..., state_lib.ANGLE] = rng.uniform(0, 360, (n, 1))
        factors[..., state_lib.SCALE] = rng.uniform(0.1, 0.2, (n, 1))
        edges, _, gymax, *_ = jax.vmap(
            lambda f, c: rasterize_pallas._prepare(f, c, hc, wc, None, True)
        )(jnp.asarray(factors, jnp.float32), jnp.ones((n,), jnp.int32))
        ok = rasterize_pallas._scene_fastok(edges, gymax, hc, True)
        return float(np.asarray(ok[:, 0]).mean())

    # Convex shapes fire near-universally; the shortfall is the
    # conservative vertex-crossing float round-trip check (measured ~8%
    # of random integer slopes fail it for triangles, ~2% for circles).
    for name in ("square", "triangle", "circle", "pentagon", "hexagon",
                 "octagon"):
        assert fastok_for(name) >= 0.85, name
    # Deeply concave shapes have >2 y-monotone chain direction changes at
    # every pose — structurally rejected. (star_4 is genuinely borderline:
    # its shallow concavity often flattens out under truncation at these
    # scales, so it legitimately fires part-time and is not asserted.)
    for name in ("star_5", "star_6", "spoke_4", "spoke_5", "spoke_6"):
        assert fastok_for(name) == 0.0, name
