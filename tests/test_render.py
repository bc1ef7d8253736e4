"""Offscreen rendering smoke test (tools/render.py, EGL headless).

The visual-artifact counterpart of the reference's GLFW viewer
(mujoco-sim.h:154-174): a saved qpos trajectory renders to a playable
MP4/GIF with no display attached."""

import os

import numpy as np
import pytest

from tpu_dialmpc.dynamics import assets
from tpu_dialmpc.tools.render import render_trajectory


@pytest.mark.parametrize("scene", ["go2_force", "h1_walk"])
def test_render_trajectory_headless(scene, tmp_path):
    m = assets.load_mj_model(scene)
    q0 = np.asarray(m.key_qpos[0])
    T = 8
    qpos = np.tile(q0, (T, 1))
    qpos[:, 0] += np.linspace(0.0, 0.1, T)
    out = str(tmp_path / f"{scene}.mp4")
    try:
        written = render_trajectory(scene, qpos, out, fps=25)
    except Exception as e:  # no EGL device in some CI sandboxes
        pytest.skip(f"offscreen GL unavailable: {e}")
    assert os.path.exists(written)
    assert os.path.getsize(written) > 1000


def test_render_torque_arrows(tmp_path):
    """tau (T, nu) draws per-joint arrow geoms without breaking encoding —
    the C21 RViz-torque-marker equivalent (control_sequence_visualizer.cpp)."""
    m = assets.load_mj_model("go2_force")
    q0 = np.asarray(m.key_qpos[0])
    T = 6
    qpos = np.tile(q0, (T, 1))
    rng = np.random.default_rng(0)
    tau = rng.normal(scale=10.0, size=(T, m.nu))
    out = str(tmp_path / "torques.mp4")
    try:
        written = render_trajectory("go2_force", qpos, out, fps=25, tau=tau)
    except Exception as e:
        pytest.skip(f"offscreen GL unavailable: {e}")
    assert os.path.exists(written)
    assert os.path.getsize(written) > 1000
    with pytest.raises(ValueError):
        render_trajectory(
            "go2_force", qpos, out, tau=np.zeros((T + 1, m.nu))
        )


def test_render_rejects_bad_shape(tmp_path):
    with pytest.raises(ValueError):
        render_trajectory(
            "go2_force", np.zeros((5, 3)), str(tmp_path / "x.mp4")
        )


def test_render_rejects_empty_trajectory(tmp_path):
    m = assets.load_mj_model("go2_force")
    with pytest.raises(ValueError, match="empty"):
        render_trajectory(
            "go2_force", np.zeros((0, m.nq)), str(tmp_path / "x.mp4")
        )


def test_open_writer_streams_and_validates(tmp_path):
    """The streaming encoders consume one frame at a time (constant memory)
    and unknown extensions fail fast instead of letting imageio guess."""
    from tpu_dialmpc.tools.render import _open_writer

    frame = np.zeros((32, 48, 3), np.uint8)
    frame[8:16, 8:16] = 255

    w = _open_writer(str(tmp_path / "a.gif"), fps=10, width=48, height=32)
    for _ in range(3):
        w.add(frame)
    path = w.close()
    assert path.endswith(".gif") and os.path.getsize(path) > 100

    w = _open_writer(str(tmp_path / "b.mp4"), fps=10, width=48, height=32)
    for _ in range(3):
        w.add(frame)
    path = w.close()
    # either a real mp4 or the documented .gif downgrade when no codec
    assert path.endswith((".mp4", ".gif")) and os.path.getsize(path) > 100

    with pytest.raises(ValueError, match="extension"):
        _open_writer(str(tmp_path / "c.webm"), fps=10, width=48, height=32)


def test_view_trajectory_requires_display(monkeypatch):
    """The interactive viewer (C14 live-window equivalent) fails cleanly on
    headless hosts instead of crashing inside GLFW."""
    from tpu_dialmpc.tools.render import view_trajectory

    monkeypatch.delenv("DISPLAY", raising=False)
    monkeypatch.delenv("WAYLAND_DISPLAY", raising=False)
    with pytest.raises(RuntimeError, match="no display"):
        view_trajectory("go2_force", np.zeros((3, 19)), dt=0.02)
