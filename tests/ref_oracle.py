"""Parity oracle: load the original spriteworld reference for comparison.

The reference (/root/reference, read-only) predates numpy 2.0 / Pillow 10, so
we install small compat shims before importing it. Tests compare the TPU
engine's behavior directly against the live reference — the strongest parity
check available, with zero code copied.
"""

import sys

import numpy as np

_SHIMMED = False


def _install_shims():
    global _SHIMMED
    if _SHIMMED:
        return
    if not hasattr(np, "cast"):
        class _Cast:
            def __getitem__(self, dtype):
                return lambda x: np.asarray(x, dtype=dtype)[()]

        np.cast = _Cast()
    if not hasattr(np, "object"):
        np.object = object
    if not hasattr(np, "bool"):
        np.bool = bool
    from PIL import Image

    if not hasattr(Image, "ANTIALIAS"):
        Image.ANTIALIAS = Image.LANCZOS
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    _SHIMMED = True


def reference():
    """Import and return the reference `spriteworld` package."""
    _install_shims()
    import spriteworld  # noqa: F401  (resolves to /root/reference)

    return spriteworld


def ref_module(name):
    """Import a submodule of the reference, e.g. 'sprite' or 'tasks'."""
    _install_shims()
    import importlib

    return importlib.import_module(f"spriteworld.{name}")


def make_ref_sprite(factors_row, factor_names=None):
    """Build a reference Sprite from one row of our factor matrix."""
    from spriteworld_tpu.core import state as state_lib

    sprite_mod = ref_module("sprite")
    constants_mod = ref_module("constants")
    names = factor_names or state_lib.FACTOR_NAMES
    kwargs = {}
    for i, name in enumerate(names):
        v = float(factors_row[i])
        if name == "shape":
            v = constants_mod.ShapeType(int(v)).name
        kwargs[name] = v
    return sprite_mod.Sprite(**kwargs)
