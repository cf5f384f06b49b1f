"""Minimal OpenAI-Gym stand-in for testing the Gym adapter without gym.

The image deliberately ships without `gym` (it is an optional extra in the
reference too, /root/reference/setup.py:59-61). This stub implements exactly
the space types and semantics the adapter touches — Box/Discrete/Tuple/Dict
with equality and sampling — mirroring gym.spaces behavior so the ported
reference tests (tests/gym_wrapper_test.py) exercise the real adapter logic.

Install with :func:`install`, which registers ``gym`` and ``gym.spaces`` in
sys.modules (a no-op if the real gym is importable).
"""

import sys
import types

import numpy as np


class Space:
    def sample(self):
        raise NotImplementedError


class Box(Space):
    def __init__(self, low, high, shape=None, dtype=np.float32):
        self.shape = tuple(shape) if shape is not None else np.shape(low)
        self.dtype = np.dtype(dtype)
        # gym.spaces.Box clamps infinities to the dtype's bounds for integer
        # dtypes (e.g. Box(-inf, inf, dtype=uint8) -> [0, 255]).
        if np.issubdtype(self.dtype, np.integer):
            info = np.iinfo(self.dtype)
            low = np.clip(low, info.min, info.max)
            high = np.clip(high, info.min, info.max)
        self.low = np.broadcast_to(np.asarray(low, self.dtype), self.shape)
        self.high = np.broadcast_to(np.asarray(high, self.dtype), self.shape)

    def sample(self):
        lo = np.where(np.isfinite(self.low), self.low, -1.0)
        hi = np.where(np.isfinite(self.high), self.high, 1.0)
        return np.random.uniform(lo, hi).astype(self.dtype)

    def __eq__(self, other):
        return (isinstance(other, Box) and self.shape == other.shape
                and self.dtype == other.dtype
                and np.array_equal(self.low, other.low)
                and np.array_equal(self.high, other.high))

    def __repr__(self):
        return f"Box({self.low.min()}, {self.high.max()}, {self.shape}, " \
               f"{self.dtype})"


class Discrete(Space):
    def __init__(self, n):
        self.n = int(n)

    def sample(self):
        return int(np.random.randint(self.n))

    def __eq__(self, other):
        return isinstance(other, Discrete) and self.n == other.n

    def __repr__(self):
        return f"Discrete({self.n})"


class Tuple(Space):
    def __init__(self, spaces):
        self.spaces = tuple(spaces)

    def sample(self):
        return tuple(s.sample() for s in self.spaces)

    def __eq__(self, other):
        return isinstance(other, Tuple) and self.spaces == other.spaces

    def __repr__(self):
        return f"Tuple({list(self.spaces)})"


class Dict(Space):
    def __init__(self, spaces):
        self.spaces = dict(spaces)

    def sample(self):
        return {k: s.sample() for k, s in self.spaces.items()}

    def __eq__(self, other):
        return isinstance(other, Dict) and self.spaces == other.spaces

    def __repr__(self):
        return f"Dict({self.spaces})"


def install():
    """Register the stub as `gym` unless the real package is available."""
    try:
        import gym  # noqa: F401
        return
    except ImportError:
        pass
    gym_mod = types.ModuleType("gym")
    spaces_mod = types.ModuleType("gym.spaces")
    for cls in (Space, Box, Discrete, Tuple, Dict):
        setattr(spaces_mod, cls.__name__, cls)
    gym_mod.spaces = spaces_mod
    sys.modules["gym"] = gym_mod
    sys.modules["gym.spaces"] = spaces_mod
