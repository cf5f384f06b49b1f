"""The README GIF generator: scripted agents must solve and export."""

import os

from PIL import Image

import make_gifs


def test_make_gif_goal_finding(tmp_path):
    path = make_gifs.make_gif(
        "goal_finding_video", str(tmp_path), seed=4, scale=2)
    assert os.path.exists(path)
    im = Image.open(path)
    # The scripted greedy agent solves this seed in ~10 steps; the episode
    # must terminate well before the 60-step cap (i.e. actually succeed).
    assert 3 <= im.n_frames < 60
    assert im.size == (128, 128)
