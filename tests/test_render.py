"""Image rendering: PIL parity at AA=1, occlusion, HSV, downsampling."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spriteworld_tpu.core import state as state_lib
from spriteworld_tpu.ops import rasterize
from spriteworld_tpu.utils import colors as color_maps

import ref_oracle


def _ref_render(factors, n, image_size=(64, 64), anti_aliasing=1,
                bg_color=None, hsv=False):
    ref_oracle._install_shims()
    pil_mod = ref_oracle.ref_module("renderers.pil_renderer")
    cmap_mod = ref_oracle.ref_module("renderers.color_maps")
    # Modern Pillow requires integer fill colors; the reference relied on
    # configs producing int-valued colors (int-dtype distributions).
    int_rgb = lambda c: tuple(int(v) for v in c)
    renderer = pil_mod.PILRenderer(
        image_size=image_size, anti_aliasing=anti_aliasing,
        bg_color=bg_color,
        color_to_rgb=cmap_mod.hsv_to_rgb if hsv else int_rgb)
    sprites = [ref_oracle.make_ref_sprite(factors[i]) for i in range(n)]
    return renderer.render(sprites)


def _ours_render(factors, n, image_size=(64, 64), anti_aliasing=1,
                 bg_color=None, hsv=False):
    return np.asarray(rasterize.render_rgb(
        jnp.asarray(factors), jnp.int32(n),
        image_size=image_size, anti_aliasing=anti_aliasing,
        bg_color=bg_color,
        color_to_rgb=color_maps.hsv_to_rgb if hsv else None))


def _scene(rng, k, int_colors=True):
    f = np.tile(state_lib.DEFAULT_FACTORS, (k, 1)).astype(np.float32)
    f[:, state_lib.X] = rng.uniform(0.15, 0.85, k)
    f[:, state_lib.Y] = rng.uniform(0.15, 0.85, k)
    f[:, state_lib.SHAPE] = rng.integers(1, 13, k)
    f[:, state_lib.ANGLE] = rng.uniform(0, 360, k)
    f[:, state_lib.SCALE] = rng.uniform(0.1, 0.3, k)
    if int_colors:
        f[:, state_lib.C0:state_lib.C2 + 1] = \
            rng.integers(30, 256, (k, 3))
    else:
        f[:, state_lib.C0:state_lib.C2 + 1] = rng.uniform(0, 1, (k, 3))
    return f


def _mismatch_fraction(a, b):
    return float(np.mean(np.any(a != b, axis=-1)))


def test_background_color():
    f = np.tile(state_lib.DEFAULT_FACTORS, (1, 1)).astype(np.float32)
    img = _ours_render(f, 0, bg_color=(10, 20, 30))
    assert (img == np.array([10, 20, 30], np.uint8)).all()


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4, 5])
def test_pil_parity_aa1_exact(seed):
    """At anti_aliasing=1 the pil_exact rasterizer is pixel-identical."""
    rng = np.random.default_rng(seed)
    k = int(rng.integers(1, 7))
    f = _scene(rng, k)
    ours = _ours_render(f, k)
    ref = _ref_render(f, k)
    np.testing.assert_array_equal(ours, ref)


def test_pil_parity_aa1_hsv():
    rng = np.random.default_rng(3)
    k = 4
    f = _scene(rng, k, int_colors=False)
    f[:, state_lib.C1] = rng.uniform(0.3, 1.0, k)
    f[:, state_lib.C2] = rng.uniform(0.9, 1.0, k)
    ours = _ours_render(f, k, hsv=True).astype(np.int32)
    ref = _ref_render(f, k, hsv=True).astype(np.int32)
    # Geometry is exact; f32 vs f64 HSV conversion may give off-by-one
    # uint8 channel values on a handful of sprites.
    assert np.abs(ours - ref).max() <= 1


@pytest.mark.parametrize("seed", [4, 7])
def test_pil_parity_aa5_exact(seed):
    """At AA>1 the scanline fill + PIL-quantized Lanczos downsample
    (ops/resample.py) reproduces the reference's resize(ANTIALIAS) pipeline
    pixel-identically (COBRA-canonical anti_aliasing=5, common.py:30-38)."""
    rng = np.random.default_rng(seed)
    k = 5
    f = _scene(rng, k)
    ours = _ours_render(f, k, anti_aliasing=5)
    ref = _ref_render(f, k, anti_aliasing=5)
    np.testing.assert_array_equal(ours, ref)


def test_lanczos_resize_matches_pillow_bitexact():
    """The resample module alone vs Pillow LANCZOS on random uint8 images,
    including a non-integer scale with window clipping at the borders."""
    from PIL import Image

    from spriteworld_tpu.ops import resample

    rng = np.random.default_rng(0)
    for (hc, wc, h, w) in [(96, 96, 32, 32), (65, 77, 13, 11)]:
        img = rng.integers(0, 256, (hc, wc, 3), dtype=np.uint8)
        ref = np.asarray(
            Image.fromarray(img).resize((w, h), resample=Image.LANCZOS))
        ours = np.asarray(resample.pil_resize_lanczos(
            jnp.asarray(img, jnp.float32), h, w)).astype(np.uint8)
        np.testing.assert_array_equal(ours, ref)


def test_fast_mode_aa5_bounded():
    """pil_exact=False (centroid fill + box average) stays within the
    reference's own AA tolerance class — the documented fast mode."""
    rng = np.random.default_rng(4)
    k = 5
    f = _scene(rng, k)
    ours = np.asarray(rasterize.render_rgb(
        jnp.asarray(f), jnp.int32(k), image_size=(64, 64),
        anti_aliasing=5, pil_exact=False)).astype(np.int32)
    ref = _ref_render(f, k, anti_aliasing=5).astype(np.int32)
    diff = np.abs(ours - ref).max(-1)
    assert int(diff.max()) <= 64
    assert float(np.mean(diff == 0)) > 0.7


def test_centroid_mode_close_to_pil():
    """The non-exact centroid fill stays boundary-close to PIL."""
    from spriteworld_tpu.ops import rasterize

    rng = np.random.default_rng(6)
    k = 4
    f = _scene(rng, k)
    ours = np.asarray(rasterize.render_rgb(
        jnp.asarray(f), jnp.int32(k), image_size=(64, 64),
        anti_aliasing=1, pil_exact=False))
    ref = _ref_render(f, k)
    assert _mismatch_fraction(ours, ref) < 0.04


def test_occlusion_order():
    """Later slots paint over earlier ones (painter's algorithm)."""
    f = np.tile(state_lib.DEFAULT_FACTORS, (2, 1)).astype(np.float32)
    f[:, state_lib.X] = 0.5
    f[:, state_lib.Y] = 0.5
    f[:, state_lib.SCALE] = 0.4
    f[0, state_lib.C0:state_lib.C2 + 1] = (255, 0, 0)
    f[1, state_lib.C0:state_lib.C2 + 1] = (0, 255, 0)
    img = _ours_render(f, 2)
    center = img[32, 32]
    np.testing.assert_array_equal(center, [0, 255, 0])
    ref = _ref_render(f, 2)
    np.testing.assert_array_equal(ref[32, 32], [0, 255, 0])


def test_vertical_flip_convention():
    """A sprite at high y must appear in low image rows (math coords)."""
    f = np.tile(state_lib.DEFAULT_FACTORS, (1, 1)).astype(np.float32)
    f[0, state_lib.X] = 0.5
    f[0, state_lib.Y] = 0.9
    f[0, state_lib.SCALE] = 0.2
    f[0, state_lib.C0] = 200
    img = _ours_render(f, 1)
    rows = np.where((img != 0).any(-1).any(-1))[0]
    assert rows.mean() < 16  # top of the image


def test_dead_slots_not_rendered():
    f = np.tile(state_lib.DEFAULT_FACTORS, (2, 1)).astype(np.float32)
    f[:, state_lib.C0] = 255
    f[:, state_lib.SCALE] = 0.3
    f[1, state_lib.X] = 0.8
    img_all = _ours_render(f, 2)
    img_one = _ours_render(f, 1)
    assert (img_all != 0).any()
    # Slot 1's region must be empty when num_sprites=1
    assert ((img_one != 0).any(-1).sum() < (img_all != 0).any(-1).sum())


def test_hsv_color_map_matches_colorsys():
    import colorsys

    rng = np.random.default_rng(5)
    hsv = rng.uniform(0, 1, (50, 3)).astype(np.float32)
    ours = np.asarray(color_maps.hsv_to_rgb(jnp.asarray(hsv)))
    ours_u8 = np.clip(ours, 0, 255).astype(np.uint8)
    for i in range(50):
        want = (255 * np.array(
            colorsys.hsv_to_rgb(*hsv[i].astype(np.float64)))).astype(
                np.uint8)
        diff = np.abs(ours_u8[i].astype(int) - want.astype(int))
        assert diff.max() <= 1, (hsv[i], ours_u8[i], want)


def test_kernel_mode_auto_falls_back_to_strips(monkeypatch):
    """One broken kernel must not take down the product render path:
    kernel_mode='auto' retries with the bounded-VMEM strips kernel when the
    preferred kernel fails to trace (VERDICT r3 item 6)."""
    from spriteworld_tpu.core import renderers
    from spriteworld_tpu.ops import rasterize_pallas

    real = rasterize_pallas.render_rgb_batch
    calls = []

    def broken_scene(*args, **kwargs):
        calls.append(kwargs.get("kernel_mode"))
        if kwargs.get("kernel_mode") != "strips":
            raise RuntimeError("scene kernel artificially broken")
        return real(*args, **kwargs)

    monkeypatch.setattr(rasterize_pallas, "render_rgb_batch", broken_scene)

    rng = np.random.default_rng(11)
    f = jnp.asarray(_scene(rng, 3))[None]
    n = jnp.asarray([3], jnp.int32)

    r = renderers.ImageRenderer((32, 32), anti_aliasing=2, use_pallas=True)
    got = np.asarray(r.render_batch(f, n, None))
    assert calls == ["auto", "strips"]
    assert r._kernel_mode == "strips"  # resolved permanently
    want = np.asarray(rasterize.render_rgb(f[0], n[0], image_size=(32, 32),
                                           anti_aliasing=2))
    assert np.abs(got[0].astype(int) - want.astype(int)).max() <= 1

    # A second call goes straight to strips (no re-raise churn).
    r.render_batch(f, n, None)
    assert calls == ["auto", "strips", "strips"]

    # An explicitly requested mode is the user's call: surface the error.
    r2 = renderers.ImageRenderer((32, 32), anti_aliasing=2, use_pallas=True,
                                 kernel_mode="scene")
    with pytest.raises(RuntimeError):
        r2.render_batch(f, n, None)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_pil_parity_degenerate_stress(seed):
    """Adversarial parity fuzz for the unified feature pass: tiny scales
    force truncation-collision point edges (degenerate horizontal edges
    that can coexist with wedges at the same vertex), axis-aligned angles
    force real horizontal edges, and high-vertex shapes maximize both.
    Pixel-identical vs live PIL at AA=1."""
    rng = np.random.default_rng(100 + seed)
    k = 6
    f = np.tile(state_lib.DEFAULT_FACTORS, (k, 1)).astype(np.float32)
    f[:, state_lib.X] = rng.uniform(0.1, 0.9, k)
    f[:, state_lib.Y] = rng.uniform(0.1, 0.9, k)
    # Collision-heavy shapes: circle (30 verts), spokes, stars.
    f[:, state_lib.SHAPE] = rng.choice([3, 8, 9, 10, 11, 12], k)
    # Half axis-aligned (horizontal edges), half arbitrary.
    f[:, state_lib.ANGLE] = np.where(
        np.arange(k) % 2 == 0, rng.choice([0.0, 90.0, 180.0], k),
        rng.uniform(0, 360, k))
    # Tiny scales: many vertices truncate onto the same pixel.
    f[:, state_lib.SCALE] = rng.uniform(0.02, 0.07, k)
    f[:, state_lib.C0:state_lib.C2 + 1] = rng.integers(30, 256, (k, 3))
    ours = _ours_render(f, k)
    ref = _ref_render(f, k)
    np.testing.assert_array_equal(ours, ref)


def test_kernel_mode_auto_no_pin_on_nonkernel_error(monkeypatch):
    """If the strips retry ALSO fails (bad inputs, not a kernel break),
    the original error surfaces and the mode stays 'auto' so a later
    valid call still gets the preferred kernel."""
    from spriteworld_tpu.core import renderers
    from spriteworld_tpu.ops import rasterize_pallas

    calls = []

    def always_broken(*args, **kwargs):
        calls.append(kwargs.get("kernel_mode"))
        raise ValueError("malformed factors")

    monkeypatch.setattr(rasterize_pallas, "render_rgb_batch", always_broken)

    r = renderers.ImageRenderer((32, 32), anti_aliasing=2, use_pallas=True)
    with pytest.raises(ValueError, match="malformed factors"):
        r.render_batch(jnp.zeros((1, 3, 10)), jnp.asarray([3]), None)
    assert calls == ["auto", "strips"]
    assert r._kernel_mode == "auto"  # not pinned


def test_scene_kernel_knob_validation():
    """Invalid scene_cspan/scene_group raise instead of silently
    miscompiling (unaligned sublane windows) or truncating the grid."""
    from spriteworld_tpu.ops import rasterize_pallas

    f = jnp.zeros((4, 2, 10))
    n = jnp.ones((4,), jnp.int32)
    kw = dict(image_size=(32, 32), anti_aliasing=2, interpret=True,
              kernel_mode="scene")
    with pytest.raises(ValueError, match="scene_cspan"):
        rasterize_pallas.render_rgb_batch(f, n, scene_cspan=50, **kw)
    with pytest.raises(ValueError, match="scene_group"):
        rasterize_pallas.render_rgb_batch(f, n, scene_group=3, **kw)
    # Valid values still render.
    rasterize_pallas.render_rgb_batch(f, n, scene_cspan=16, scene_group=2,
                                      **kw)


def test_explicit_scene_mode_preconditions_raise():
    """An explicit kernel_mode='scene' whose hard preconditions fail must
    raise, not silently degrade to strips (the explicit-mode contract in
    renderers._pallas_call)."""
    from spriteworld_tpu.ops import rasterize_pallas

    n = jnp.ones((2,), jnp.int32)
    # W*aa = 30 is not 8-aligned.
    with pytest.raises(ValueError, match="kernel_mode='scene' requires"):
        rasterize_pallas.render_rgb_batch(
            jnp.zeros((2, 2, 10)), n, image_size=(30, 30), anti_aliasing=1,
            interpret=True, kernel_mode="scene")
    # Zero sprite slots.
    with pytest.raises(ValueError, match="kernel_mode='scene' requires"):
        rasterize_pallas.render_rgb_batch(
            jnp.zeros((2, 0, 10)), n, image_size=(32, 32), anti_aliasing=2,
            interpret=True, kernel_mode="scene")


def test_scene_knobs_rejected_off_scene_path():
    """scene_cspan/scene_group passed while the mode resolves to strips
    would be silently ignored — reject them loudly instead."""
    from spriteworld_tpu.ops import rasterize_pallas

    f = jnp.zeros((4, 2, 10))
    n = jnp.ones((4,), jnp.int32)
    with pytest.raises(ValueError, match="scene_cspan/scene_group"):
        rasterize_pallas.render_rgb_batch(
            f, n, image_size=(32, 32), anti_aliasing=2, interpret=True,
            kernel_mode="strips", scene_cspan=16)
    with pytest.raises(ValueError, match="scene_cspan/scene_group"):
        # interpret=True makes "auto" resolve to strips.
        rasterize_pallas.render_rgb_batch(
            f, n, image_size=(32, 32), anti_aliasing=2, interpret=True,
            kernel_mode="auto", scene_group=2)
