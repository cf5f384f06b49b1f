"""Shared definitions across all COBRA tasks.

Rebuild of /root/reference/spriteworld/configs/cobra/common.py:26-38.
"""

from __future__ import annotations

from spriteworld_tpu.core import actions
from spriteworld_tpu.core import renderers as renderers_lib


def action_space():
    return actions.SelectMove(scale=0.25)


def renderers(anti_aliasing: int = 5):
    return {
        "image": renderers_lib.ImageRenderer(
            image_size=(64, 64),
            anti_aliasing=anti_aliasing,
            color_to_rgb="hsv",
        )
    }
