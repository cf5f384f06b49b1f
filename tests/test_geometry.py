"""Geometry parity: vertices and containment vs the live reference."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spriteworld_tpu import constants
from spriteworld_tpu.core import state as state_lib
from spriteworld_tpu.ops import geometry

import ref_oracle


def _random_factors(rng, k):
    """Random plausible factor matrix [k, 10]."""
    f = np.zeros((k, 10), dtype=np.float32)
    f[:, state_lib.X] = rng.uniform(0.1, 0.9, k)
    f[:, state_lib.Y] = rng.uniform(0.1, 0.9, k)
    f[:, state_lib.SHAPE] = rng.integers(1, 13, k)
    f[:, state_lib.ANGLE] = rng.uniform(0, 360, k)
    f[:, state_lib.SCALE] = rng.uniform(0.05, 0.3, k)
    f[:, state_lib.C0:state_lib.C2 + 1] = rng.uniform(0, 1, (k, 3))
    return f


def test_world_vertices_match_reference():
    rng = np.random.default_rng(0)
    factors = _random_factors(rng, 24)
    ours = np.asarray(geometry.world_vertices(jnp.asarray(factors)))
    for i in range(factors.shape[0]):
        ref_sprite = ref_oracle.make_ref_sprite(factors[i])
        n = constants.VERTEX_COUNTS[int(factors[i, state_lib.SHAPE])]
        np.testing.assert_allclose(
            ours[i, :n], ref_sprite.vertices, atol=2e-5)


def test_containment_matches_reference():
    rng = np.random.default_rng(1)
    factors = _random_factors(rng, 16)
    points = rng.uniform(0, 1, (64, 2)).astype(np.float32)
    verts = geometry.world_vertices(jnp.asarray(factors))
    # [P, K]: broadcast points against sprites
    ours = np.asarray(
        jax.vmap(lambda p: geometry.points_in_polygons(verts, p))(
            jnp.asarray(points)))
    mismatches = 0
    for i in range(factors.shape[0]):
        ref_sprite = ref_oracle.make_ref_sprite(factors[i])
        for j, p in enumerate(points):
            expected = ref_sprite.contains_point(p.astype(np.float64))
            if bool(ours[j, i]) != bool(expected):
                mismatches += 1
    # Allow a tiny number of float32-vs-float64 boundary disagreements.
    assert mismatches <= 2, f"{mismatches} containment mismatches"


def test_containment_dense_grid_parity():
    """Dense grid through a star sprite — the concave case must be exact."""
    factors = np.zeros((1, 10), dtype=np.float32)
    factors[0, state_lib.X] = 0.5
    factors[0, state_lib.Y] = 0.5
    factors[0, state_lib.SHAPE] = constants.ShapeType.star_5
    factors[0, state_lib.ANGLE] = 33.0
    factors[0, state_lib.SCALE] = 0.4
    grid = np.stack(
        np.meshgrid(np.linspace(0.05, 0.95, 37), np.linspace(0.05, 0.95, 37)),
        axis=-1).reshape(-1, 2).astype(np.float32)
    verts = geometry.world_vertices(jnp.asarray(factors))
    ours = np.asarray(
        jax.vmap(lambda p: geometry.points_in_polygons(verts, p))(
            jnp.asarray(grid)))[:, 0]
    ref_sprite = ref_oracle.make_ref_sprite(factors[0])
    expected = np.array(
        [ref_sprite.contains_point(p.astype(np.float64)) for p in grid])
    disagreements = int(np.sum(ours != expected))
    assert disagreements <= 1


def test_topmost_hit_prefers_foreground():
    hits = jnp.array([True, False, True, True, False])
    idx, any_hit = geometry.topmost_hit(hits, jnp.int32(5))
    assert bool(any_hit) and int(idx) == 3
    # Limit excludes the top slot
    idx, any_hit = geometry.topmost_hit(hits, jnp.int32(3))
    assert bool(any_hit) and int(idx) == 2
    idx, any_hit = geometry.topmost_hit(jnp.zeros(5, bool), jnp.int32(5))
    assert not bool(any_hit) and int(idx) == 0


def test_out_of_frame():
    f = jnp.asarray(np.tile(state_lib.DEFAULT_FACTORS, (3, 1)))
    assert not bool(geometry.out_of_frame(f, jnp.int32(3)))
    f = f.at[1, state_lib.X].set(1.2)
    assert bool(geometry.out_of_frame(f, jnp.int32(3)))
    # Dead slot out of frame is ignored
    assert not bool(geometry.out_of_frame(f, jnp.int32(1)))
