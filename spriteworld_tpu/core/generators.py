"""Scene generators: distributions -> packed batched sprite factor matrices.

TPU-native rebuild of /root/reference/spriteworld/sprite_generators.py. The
reference composes callables returning Python lists of Sprite objects; here a
generator is an object with a static capacity ``max_sprites`` and a traceable
``sample(key) -> (factors f32[max_sprites, 10], num i32)``.

Packing invariant: live sprites always occupy slots [0, num); slot order is
z-order (higher slot = foreground), exactly like reference list order. Dead
slots hold the default factor row so downstream masked math stays finite.

Variable sprite counts (the reference accepts callables like
``lambda: np.random.randint(1, 7)``, sprite_generators.py:40-42) are expressed
with :class:`RandInt`, which samples the count from the traced PRNG key while
keeping array shapes static.
"""

from __future__ import annotations

from typing import Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from spriteworld_tpu.core import state as state_lib

_BIG = 1 << 20


class RandInt:
    """Uniform random integer in [low, high) — a traceable sprite count."""

    def __init__(self, low: int, high: int):
        if high <= low:
            raise ValueError(f"need high > low, got [{low}, {high})")
        self.low = int(low)
        self.high = int(high)

    @property
    def max_value(self) -> int:
        return self.high - 1

    def __call__(self, key) -> jnp.ndarray:
        return jax.random.randint(key, (), self.low, self.high)


NumSprites = Union[int, Tuple[int, int], RandInt]


def _pack(factors: jnp.ndarray, valid: jnp.ndarray):
    """Stable-partition live rows to the front, preserving relative order."""
    k = factors.shape[0]
    idx = jnp.arange(k)
    order = jnp.argsort(jnp.where(valid, idx, idx + _BIG), stable=True)
    packed = factors[order]
    num = valid.sum().astype(jnp.int32)
    # Reset dead rows to defaults.
    alive = idx < num
    packed = jnp.where(alive[:, None], packed,
                       jnp.asarray(state_lib.DEFAULT_FACTORS)[None, :])
    return packed, num


class SpriteGenerator:
    """Base: traceable scene sampler with static capacity."""

    max_sprites: int

    def sample(self, key):
        """(factors f32[max_sprites, 10], num i32)."""
        return self.sample_with_status(key)[:2]

    def sample_with_status(self, key):
        """(factors, num, ok: bool scalar).

        ok=False flags a scene containing a sprite whose factor-distribution
        rejection sampling exhausted its bound (the jit-safe analogue of the
        reference's ValueError, factor_distributions.py:248-249).

        Custom generators may override either method; a `sample`-only
        subclass gets an always-ok status shim here.
        """
        if type(self).sample is SpriteGenerator.sample:
            raise NotImplementedError(
                "SpriteGenerator subclasses must implement sample() or "
                "sample_with_status().")
        factors, num = self.sample(key)
        return factors, num, jnp.bool_(True)


class GenerateSprites(SpriteGenerator):
    """Sample `num_sprites` iid sprites from a factor distribution.

    Mirrors `sprite_generators.generate_sprites` (reference :27-45), with
    RandInt/tuple standing in for callable counts.
    """

    def __init__(self, factor_dist, num_sprites: NumSprites = 1):
        self.factor_dist = factor_dist
        if isinstance(num_sprites, tuple):
            num_sprites = RandInt(*num_sprites)
        self.num_sprites = num_sprites
        self.max_sprites = (
            num_sprites if isinstance(num_sprites, int)
            else num_sprites.max_value)

    def sample_with_status(self, key):
        k_num, k_factors = jax.random.split(key)
        if isinstance(self.num_sprites, int):
            num = jnp.int32(self.num_sprites)
        else:
            num = self.num_sprites(k_num).astype(jnp.int32)
        kmax = self.max_sprites
        specs, oks = jax.vmap(self.factor_dist.sample_with_status)(
            jax.random.split(k_factors, kmax))
        factors = jnp.tile(
            jnp.asarray(state_lib.DEFAULT_FACTORS), (kmax, 1))
        for name, values in specs.items():
            factors = factors.at[:, state_lib.FACTOR_INDEX[name]].set(
                values.astype(jnp.float32))
        alive = jnp.arange(kmax) < num
        factors = jnp.where(
            alive[:, None], factors,
            jnp.asarray(state_lib.DEFAULT_FACTORS)[None, :])
        # Only live slots count: a dead slot's discarded draw cannot poison
        # the scene status.
        ok = jnp.all(oks | ~alive)
        return factors, num, ok


class ChainGenerators(SpriteGenerator):
    """Concatenate generators ('AND'; reference :48-70). Order preserved."""

    def __init__(self, *gens: SpriteGenerator):
        self.gens = gens
        self.max_sprites = sum(g.max_sprites for g in gens)

    def sample_with_status(self, key):
        keys = jax.random.split(key, len(self.gens))
        parts, valids = [], []
        ok = jnp.bool_(True)
        for g, k in zip(self.gens, keys):
            f, n, g_ok = g.sample_with_status(k)
            parts.append(f)
            valids.append(jnp.arange(g.max_sprites) < n)
            ok = ok & g_ok
        factors, num = _pack(jnp.concatenate(parts, axis=0),
                             jnp.concatenate(valids, axis=0))
        return factors, num, ok


class SampleGenerator(SpriteGenerator):
    """Sample one of several generators ('OR'; reference :73-98)."""

    def __init__(self, gens: Sequence[SpriteGenerator], p=None):
        self.gens = list(gens)
        self.p = None if p is None else np.asarray(p)
        self.max_sprites = max(g.max_sprites for g in self.gens)

    def sample_with_status(self, key):
        k_choice, k_gen = jax.random.split(key)
        idx = jax.random.choice(
            k_choice, len(self.gens),
            p=None if self.p is None else jnp.asarray(self.p))

        def branch(g):
            def fn(k):
                f, n, ok = g.sample_with_status(k)
                pad = self.max_sprites - g.max_sprites
                if pad:
                    f = jnp.concatenate(
                        [f, jnp.tile(jnp.asarray(state_lib.DEFAULT_FACTORS),
                                     (pad, 1))], axis=0)
                return f, n, ok
            return fn

        return jax.lax.switch(idx, [branch(g) for g in self.gens], k_gen)


class Shuffle(SpriteGenerator):
    """Randomize z-order of the generated sprites (reference :101-128)."""

    def __init__(self, gen: SpriteGenerator):
        self.gen = gen
        self.max_sprites = gen.max_sprites

    def sample_with_status(self, key):
        k_gen, k_perm = jax.random.split(key)
        factors, num, ok = self.gen.sample_with_status(k_gen)
        k = self.max_sprites
        # Random keys for live rows, +inf for dead rows: argsort yields a
        # uniform permutation of the live prefix, dead rows stay at the back.
        r = jax.random.uniform(k_perm, (k,))
        r = jnp.where(jnp.arange(k) < num, r, jnp.inf)
        return factors[jnp.argsort(r)], num, ok


# Functional aliases mirroring the reference module-level API.
def generate_sprites(factor_dist, num_sprites: NumSprites = 1):
    return GenerateSprites(factor_dist, num_sprites)


def chain_generators(*gens):
    return ChainGenerators(*gens)


def sample_generator(gens, p=None):
    return SampleGenerator(gens, p)


def shuffle(gen):
    return Shuffle(gen)
