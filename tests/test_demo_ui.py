"""Headless (Agg) smoke tests for the interactive demo UI.

The reference demo_ui (demo_ui.py:298-334) can only be exercised with a
display; here the human agents are scripted so `setup_run_ui` drives a real
env step + UI update cycle under the Agg backend.
"""

import matplotlib

matplotlib.use("Agg")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from spriteworld_tpu import demo_ui  # noqa: E402


def test_setup_run_ui_drag_and_drop_headless(monkeypatch):
    from spriteworld_tpu.configs.cobra import goal_finding_new_shape

    cfg = goal_finding_new_shape.get_config("train")
    scripted = iter(
        [np.asarray([0.5, 0.5, 0.6, 0.6], np.float32), None])
    monkeypatch.setattr(
        demo_ui.HumanDragAndDropAgent, "step",
        lambda self, ts: next(scripted))
    # Runs reset -> UI update -> one env step -> UI update -> agent quits.
    demo_ui.setup_run_ui(cfg, render_size=32, anti_aliasing=1)


def test_setup_run_ui_embodied_headless(monkeypatch):
    from spriteworld_tpu.configs.examples import goal_finding_embodied

    cfg = goal_finding_embodied.get_config()
    scripted = iter([np.asarray([0, 1], np.int32), None])
    monkeypatch.setattr(
        demo_ui.HumanEmbodiedAgent, "step", lambda self, ts: next(scripted))
    demo_ui.setup_run_ui(cfg, render_size=32, anti_aliasing=1)


def test_setup_run_ui_rejects_unknown_action_space():
    with pytest.raises(ValueError, match="does not support"):
        demo_ui.setup_run_ui({"action_space": object()})


def test_ui_update_tracks_rewards_and_success():
    import dm_env

    ui = demo_ui.MatplotlibUI((8, 8))
    obs = {"image": np.zeros((8, 8, 3), np.uint8), "success": True}
    ui.update(dm_env.transition(reward=1.5, observation=obs), None)
    ui.update(dm_env.transition(reward=-0.5, observation=obs), None)
    assert ui._rewards == [1.5, -0.5]
    spine = next(iter(ui._ax_image.spines.values()))
    assert spine.get_edgecolor()[:3] == (0.0, 128 / 255, 0.0)  # green
