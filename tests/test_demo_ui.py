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


class _Event:
    """Synthetic matplotlib event (only the fields the agents read)."""

    def __init__(self, **kw):
        self.inaxes = None
        self.xdata = self.ydata = None
        self.key = None
        self.__dict__.update(kw)


def test_drag_agent_click_math_without_monkeypatched_step(monkeypatch):
    """Feed synthetic button-press events through _on_click and let the
    REAL step() assemble the 4-vector — pins the /render_size scaling and
    the y-flip (image row 0 is the TOP; math y grows upward)."""
    import matplotlib.pyplot as plt

    agent = demo_ui.HumanDragAndDropAgent((256, 256))
    fig, ax = plt.subplots()
    try:
        agent.register_callbacks(fig, ax)

        clicks = iter([
            _Event(inaxes=ax, xdata=64.0, ydata=64.0),    # top-left area
            _Event(inaxes=ax, xdata=192.0, ydata=224.0),  # bottom-right area
            _Event(inaxes=None, xdata=1.0, ydata=1.0),    # outside: ignored
        ])
        # Each UI pause tick delivers the next click, like a human would.
        monkeypatch.setattr(plt, "pause",
                            lambda *_: agent._on_click(next(clicks)))
        action = agent.step(timestep=None)
    finally:
        plt.close(fig)

    # x = xdata/w; y = 1 - ydata/h (y-flip: ydata is the image ROW).
    np.testing.assert_allclose(
        action, [64 / 256, 1 - 64 / 256, 192 / 256, 1 - 224 / 256],
        atol=1e-6)
    assert action.dtype == np.float32


def test_drag_agent_ignores_clicks_outside_image_axes(monkeypatch):
    import matplotlib.pyplot as plt

    agent = demo_ui.HumanDragAndDropAgent((128, 128))
    fig, ax = plt.subplots()
    try:
        agent.register_callbacks(fig, ax)
        events = iter([
            _Event(inaxes=None, xdata=5.0, ydata=5.0),     # off-axes: no-op
            _Event(inaxes=ax, xdata=32.0, ydata=96.0),
            _Event(inaxes=ax, xdata=96.0, ydata=32.0),
        ])
        monkeypatch.setattr(plt, "pause",
                            lambda *_: agent._on_click(next(events)))
        action = agent.step(timestep=None)
    finally:
        plt.close(fig)
    np.testing.assert_allclose(
        action, [0.25, 0.25, 0.75, 0.75], atol=1e-6)


def test_embodied_agent_key_math_without_monkeypatched_step(monkeypatch):
    """Synthetic key presses through _on_key: space toggles carry, WASD and
    arrows map to the reference motion indices (demo_ui.py:223-231)."""
    import matplotlib.pyplot as plt

    agent = demo_ui.HumanEmbodiedAgent()
    fig, ax = plt.subplots()
    try:
        agent.register_callbacks(fig, ax)
        # Direction keys alone: carry stays 0.
        for key, want_dir in [("w", 0), ("a", 1), ("s", 2), ("d", 3),
                              ("up", 0), ("left", 1), ("down", 2),
                              ("right", 3)]:
            keys = iter([_Event(key=key)])
            monkeypatch.setattr(plt, "pause",
                                lambda *_: agent._on_key(next(keys)))
            action = agent.step(timestep=None)
            np.testing.assert_array_equal(action, [0, want_dir])

        # Space toggles carry on; it persists across direction presses.
        keys = iter([_Event(key=" "), _Event(key="d")])
        monkeypatch.setattr(plt, "pause",
                            lambda *_: agent._on_key(next(keys)))
        action = agent.step(timestep=None)
        np.testing.assert_array_equal(action, [1, 3])

        # And toggles back off.
        keys = iter([_Event(key=" "), _Event(key="up")])
        monkeypatch.setattr(plt, "pause",
                            lambda *_: agent._on_key(next(keys)))
        action = agent.step(timestep=None)
        np.testing.assert_array_equal(action, [0, 0])
    finally:
        plt.close(fig)
