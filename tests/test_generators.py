"""Scene generators: packing invariant, composition, shuffling."""

import numpy as np

import jax
import jax.numpy as jnp

from spriteworld_tpu.core import distributions as distribs
from spriteworld_tpu.core import generators
from spriteworld_tpu.core import state as state_lib


def _dist(lo=0.1, hi=0.9, c0=(0.0, 1.0)):
    return distribs.Product([
        distribs.Continuous("x", lo, hi),
        distribs.Continuous("y", lo, hi),
        distribs.Continuous("c0", *c0),
        distribs.Discrete("shape", ["square"]),
        distribs.Discrete("scale", [0.13]),
    ])


def _batch(gen, n=32, seed=0):
    """Jit+vmap a generator over n keys -> (factors [n,K,10], nums [n])."""
    keys = jax.random.split(jax.random.key(seed), n)
    f, num = jax.jit(jax.vmap(gen.sample))(keys)
    return np.asarray(f), np.asarray(num)


def _check_packed(factors, num):
    k = factors.shape[0]
    num = int(num)
    assert 0 <= num <= k
    dead = np.asarray(factors)[num:]
    np.testing.assert_allclose(
        dead, np.tile(state_lib.DEFAULT_FACTORS, (k - num, 1)))


def test_generate_fixed_count():
    g = generators.generate_sprites(_dist(), num_sprites=3)
    f, n = _batch(g, 4)
    assert g.max_sprites == 3 and (n == 3).all()
    assert f.shape == (4, 3, 10)
    x = f[..., state_lib.X]
    assert ((x >= 0.1) & (x < 0.9)).all()
    assert (f[..., state_lib.SHAPE] == 2.0).all()


def test_generate_random_count():
    g = generators.generate_sprites(_dist(), num_sprites=(1, 7))
    assert g.max_sprites == 6
    f, n = _batch(g, 64)
    assert set(np.unique(n)).issubset(set(range(1, 7)))
    assert len(np.unique(n)) >= 4
    for i in range(len(n)):
        _check_packed(f[i], n[i])


def test_chain_concatenates_in_order():
    g1 = generators.generate_sprites(_dist(c0=(0.0, 0.1)), 2)
    g2 = generators.generate_sprites(_dist(c0=(0.9, 1.0)), 3)
    g = generators.chain_generators(g1, g2)
    assert g.max_sprites == 5
    f, n = _batch(g, 8)
    assert (n == 5).all()
    c0 = f[..., state_lib.C0]
    assert (c0[:, :2] < 0.1).all() and (c0[:, 2:] >= 0.9).all()


def test_chain_packs_variable_counts():
    g1 = generators.generate_sprites(_dist(c0=(0.0, 0.1)), (1, 4))
    g2 = generators.generate_sprites(_dist(c0=(0.9, 1.0)), (1, 4))
    g = generators.chain_generators(g1, g2)
    f, n = _batch(g, 32)
    for i in range(len(n)):
        _check_packed(f[i], n[i])
        c0 = f[i, : int(n[i]), state_lib.C0]
        # g1 sprites (low c0) all precede g2 sprites (high c0)
        switch = np.argmax(c0 >= 0.5)
        assert (c0[:switch] < 0.5).all() and (c0[switch:] >= 0.5).all()


def test_sample_generator_is_exclusive():
    g1 = generators.generate_sprites(_dist(c0=(0.0, 0.1)), 2)
    g2 = generators.generate_sprites(_dist(c0=(0.9, 1.0)), 4)
    g = generators.sample_generator([g1, g2])
    assert g.max_sprites == 4
    f, n = _batch(g, 32)
    saw = set()
    for i in range(len(n)):
        _check_packed(f[i], n[i])
        c0 = f[i, : int(n[i]), state_lib.C0]
        if int(n[i]) == 2:
            assert (c0 < 0.1).all()
            saw.add("g1")
        else:
            assert int(n[i]) == 4 and (c0 >= 0.9).all()
            saw.add("g2")
    assert saw == {"g1", "g2"}


def test_sample_generator_probs():
    g1 = generators.generate_sprites(_dist(), 1)
    g2 = generators.generate_sprites(_dist(), 2)
    g = generators.sample_generator([g1, g2], p=[1.0, 0.0])
    _, n = _batch(g, 16)
    assert (n == 1).all()


def test_shuffle_permutes_live_prefix():
    g1 = generators.generate_sprites(_dist(c0=(0.0, 0.1)), 2)
    g2 = generators.generate_sprites(_dist(c0=(0.9, 1.0)), 2)
    g = generators.shuffle(generators.chain_generators(g1, g2))
    f, n = _batch(g, 32)
    orders = set()
    for i in range(len(n)):
        _check_packed(f[i], n[i])
        orders.add(tuple(f[i, : int(n[i]), state_lib.C0] >= 0.5))
    assert len(orders) > 2  # actually permutes


def test_generators_jit_and_vmap():
    g = generators.shuffle(generators.chain_generators(
        generators.generate_sprites(_dist(), (1, 4)),
        generators.generate_sprites(_dist(), 2),
    ))
    f, n = _batch(g, 16)
    assert f.shape == (16, g.max_sprites, 10)
    assert n.shape == (16,)
    for i in range(16):
        _check_packed(f[i], n[i])
