"""Action-space parity: identical scenes + actions vs the live reference."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spriteworld_tpu.core import actions
from spriteworld_tpu.core import state as state_lib

import ref_oracle


def _random_factors(rng, k):
    f = np.tile(state_lib.DEFAULT_FACTORS, (k, 1)).astype(np.float32)
    f[:, state_lib.X] = rng.uniform(0.2, 0.8, k)
    f[:, state_lib.Y] = rng.uniform(0.2, 0.8, k)
    f[:, state_lib.SHAPE] = rng.integers(1, 13, k)
    f[:, state_lib.ANGLE] = rng.uniform(0, 360, k)
    f[:, state_lib.SCALE] = rng.uniform(0.1, 0.3, k)
    return f


def _ref_sprites(factors, n):
    return [ref_oracle.make_ref_sprite(factors[i]) for i in range(n)]


def _positions(sprites):
    return np.array([s.position for s in sprites])


@pytest.mark.parametrize("keep_in_frame", [True, False])
@pytest.mark.parametrize("cls,ref_name,scale", [
    (actions.SelectMove, "SelectMove", 0.25),
    (actions.DragAndDrop, "DragAndDrop", 0.5),
])
def test_click_action_parity(cls, ref_name, scale, keep_in_frame):
    ref_as = ref_oracle.ref_module("action_spaces")
    ours = cls(scale=scale, motion_cost=0.7)
    theirs = getattr(ref_as, ref_name)(scale=scale, motion_cost=0.7)
    rng = np.random.default_rng(7)
    step = jax.jit(lambda a, f, n: ours.step(
        a, f, n, keep_in_frame, jax.random.key(0)),
        static_argnames=())

    for trial in range(25):
        k = int(rng.integers(1, 7))
        factors = _random_factors(rng, k)
        sprites = _ref_sprites(factors, k)
        # Aim half the clicks at a sprite so hits are common.
        if trial % 2 == 0:
            target = rng.integers(0, k)
            click = factors[target, :2] + rng.normal(0, 0.01, 2)
        else:
            click = rng.uniform(0, 1, 2)
        action = np.concatenate(
            [click, rng.uniform(0, 1, 2)]).astype(np.float32)

        new_factors, cost = step(jnp.asarray(action),
                                 jnp.asarray(factors), jnp.int32(k))
        ref_cost = theirs.step(
            action.astype(np.float64), sprites, keep_in_frame=keep_in_frame)

        np.testing.assert_allclose(
            np.asarray(new_factors)[:k, :2], _positions(sprites),
            atol=3e-6, err_msg=f"trial {trial}")
        assert float(cost) == pytest.approx(ref_cost, abs=1e-6)


@pytest.mark.parametrize("keep_in_frame", [True, False])
def test_embodied_parity(keep_in_frame):
    ref_as = ref_oracle.ref_module("action_spaces")
    ours = actions.Embodied(step_size=0.05, motion_cost=0.3)
    theirs = ref_as.Embodied(step_size=0.05, motion_cost=0.3)
    rng = np.random.default_rng(11)
    step = jax.jit(lambda a, f, n: ours.step(
        a, f, n, keep_in_frame, jax.random.key(0)))

    for trial in range(20):
        k = int(rng.integers(2, 7))
        factors = _random_factors(rng, k)
        if trial % 2 == 0:
            # Put the body on top of another sprite so carry triggers.
            factors[k - 1, :2] = factors[rng.integers(0, k - 1), :2]
        sprites = _ref_sprites(factors, k)
        action = np.array(
            [rng.integers(0, 2), rng.integers(0, 4)], dtype=np.int32)

        new_factors, cost = step(jnp.asarray(action),
                                 jnp.asarray(factors), jnp.int32(k))
        ref_cost = theirs.step(
            [int(action[0]), int(action[1])], sprites,
            keep_in_frame=keep_in_frame)

        np.testing.assert_allclose(
            np.asarray(new_factors)[:k, :2], _positions(sprites),
            atol=3e-6, err_msg=f"trial {trial}")
        assert float(cost) == pytest.approx(ref_cost, abs=1e-6)


def test_select_move_multi_step_choreography():
    """Deterministic choreography: click, move, z-order, clipping."""
    ours = actions.SelectMove(scale=1.0)
    f = np.tile(state_lib.DEFAULT_FACTORS, (2, 1)).astype(np.float32)
    f[0, :2] = [0.3, 0.3]
    f[1, :2] = [0.3, 0.3]  # stacked: slot 1 is foreground
    f[:, state_lib.SCALE] = 0.3
    step = jax.jit(lambda a, fac: ours.step(
        a, fac, jnp.int32(2), True, jax.random.key(0)))

    # Click the stack: the foreground sprite (slot 1) moves.
    nf, _ = step(jnp.asarray([0.3, 0.3, 0.7, 0.6], jnp.float32),
                 jnp.asarray(f))
    np.testing.assert_allclose(np.asarray(nf)[1, :2], [0.5, 0.4], atol=1e-6)
    np.testing.assert_allclose(np.asarray(nf)[0, :2], [0.3, 0.3], atol=1e-6)

    # Click empty space: nothing moves.
    nf2, _ = step(jnp.asarray([0.9, 0.9, 0.0, 0.0], jnp.float32),
                  jnp.asarray(f))
    np.testing.assert_allclose(np.asarray(nf2)[:, :2], f[:, :2], atol=1e-6)

    # Motion clipped at the frame edge.
    nf3, _ = step(jnp.asarray([0.3, 0.3, 1.0, 1.0], jnp.float32),
                  jnp.asarray(f))
    np.testing.assert_allclose(np.asarray(nf3)[1, :2], [0.8, 0.8], atol=1e-6)


def test_sample_shapes():
    sm = actions.SelectMove()
    a = sm.sample(jax.random.key(0))
    assert a.shape == (4,) and ((np.asarray(a) >= 0).all())
    em = actions.Embodied()
    b = np.asarray(em.sample(jax.random.key(0)))
    assert b.shape == (2,) and b[0] in (0, 1) and b[1] in range(4)


def test_selectmove_noise_statistics():
    """apply_noise_to_action adds iid N(0, noise_scale^2) per coordinate,
    matching the reference (action_spaces.py:69-75): mean stays at the
    action, std matches noise_scale, and no clipping is applied."""
    sigma = 0.1
    space = actions.SelectMove(scale=0.25, noise_scale=sigma)
    base = jnp.asarray([0.5, 0.5, 0.5, 0.5], jnp.float32)
    n = 4096
    noisy = jax.vmap(lambda k: space.apply_noise_to_action(base, k))(
        jax.random.split(jax.random.key(0), n))
    noisy = np.asarray(noisy)
    # 4 coords x 4096 draws; 5-sigma bounds on the moment estimates.
    assert np.abs(noisy.mean(0) - 0.5).max() < 5 * sigma / np.sqrt(n)
    assert np.abs(noisy.std(0) - sigma).max() < 5 * sigma / np.sqrt(2 * n)
    # Unclipped tails exist (reference applies no clipping).
    assert noisy.max() > 0.5 + 2 * sigma
    # noise_scale=None is the identity (reference :69-75 else-branch).
    space_clean = actions.SelectMove(scale=0.25)
    out = space_clean.apply_noise_to_action(base, jax.random.key(1))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(base))


def test_selectmove_noise_flows_into_selection():
    """With huge noise the (noisy) click misses the sprite the clean click
    would hit, so the sprite stays put — noise affects selection, not just
    motion."""
    factors = np.tile(state_lib.DEFAULT_FACTORS, (1, 1)).astype(np.float32)
    factors[0, :2] = 0.5
    factors[0, state_lib.SCALE] = 0.1
    f = jnp.asarray(factors)
    act = jnp.asarray([0.5, 0.5, 0.9, 0.9], jnp.float32)

    clean = actions.SelectMove(scale=0.25)
    f_clean, _ = clean.step(act, f, jnp.int32(1), True, jax.random.key(0))
    assert float(jnp.abs(f_clean[0, :2] - f[0, :2]).max()) > 0.01

    noisy = actions.SelectMove(scale=0.25, noise_scale=50.0)
    f_noisy, _ = noisy.step(act, f, jnp.int32(1), True, jax.random.key(0))
    np.testing.assert_array_equal(
        np.asarray(f_noisy[0, :2]), np.asarray(f[0, :2]))
