"""Offscreen trajectory rendering (headless MP4/GIF).

The reference's primary UX is a live GLFW/OpenGL MuJoCo viewer
(dial_mpc_eigen/include/mujoco-sim.h:154-174, simulation.h:28-36) replaying a
planned trajectory (dial-core-simulate.cpp:173-214).  A TPU pod has no
display, so the equivalent here is offscreen EGL rendering of a saved
trajectory npz (`cli run --out traj.npz` → `cli render --trajectory
traj.npz`): every control step's qpos is pushed through mj_forward and
rendered with a torso-tracking camera, then encoded to MP4 (OpenCV) or GIF
(imageio fallback when no codec is available).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


def render_trajectory(
    scene: str,
    qpos: np.ndarray,
    out: str,
    fps: float = 50.0,
    width: int = 640,
    height: int = 480,
    camera_distance: float = 2.0,
    track_body: Optional[str] = None,
    max_frames: int = 2000,
) -> str:
    """Render a (T, nq) qpos trajectory of the named scene to MP4/GIF.

    Returns the path actually written (the extension may change to .gif if
    no MP4 codec is available).  Frames beyond `max_frames` are dropped by
    striding so pathological trajectory lengths can't OOM the host.
    """
    os.environ.setdefault("MUJOCO_GL", "egl")
    import mujoco

    from tpu_dialmpc.dynamics import assets

    m = assets.load_mj_model(scene)
    d = mujoco.MjData(m)
    qpos = np.asarray(qpos)
    if qpos.ndim != 2 or qpos.shape[1] != m.nq:
        raise ValueError(f"qpos must be (T, {m.nq}), got {qpos.shape}")
    stride = max(1, int(np.ceil(qpos.shape[0] / max_frames)))
    qpos = qpos[::stride]

    cam = mujoco.MjvCamera()
    mujoco.mjv_defaultCamera(cam)
    if track_body is None:
        # track the root body with a free joint (torso), if any
        free = [
            j
            for j in range(m.njnt)
            if m.jnt_type[j] == mujoco.mjtJoint.mjJNT_FREE
        ]
        body_id = int(m.jnt_bodyid[free[0]]) if free else 0
    else:
        body_id = mujoco.mj_name2id(m, mujoco.mjtObj.mjOBJ_BODY, track_body)
    cam.type = mujoco.mjtCamera.mjCAMERA_TRACKING
    cam.trackbodyid = body_id
    cam.distance = camera_distance
    cam.elevation = -20.0
    cam.azimuth = 135.0

    renderer = mujoco.Renderer(m, height, width)
    frames = []
    try:
        for t in range(qpos.shape[0]):
            d.qpos[:] = qpos[t]
            mujoco.mj_forward(m, d)
            renderer.update_scene(d, camera=cam)
            frames.append(renderer.render().copy())
    finally:
        renderer.close()

    eff_fps = fps / stride
    return _encode(frames, out, eff_fps)


def _encode(frames, out: str, fps: float) -> str:
    """MP4 via OpenCV if a codec is available, else GIF via imageio."""
    if out.endswith(".mp4"):
        try:
            import cv2

            h, w = frames[0].shape[:2]
            vw = cv2.VideoWriter(
                out, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h)
            )
            if vw.isOpened():
                for f in frames:
                    vw.write(cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
                vw.release()
                return out
            vw.release()
        except Exception:
            pass
        out = out[:-4] + ".gif"
    import imageio

    imageio.mimsave(out, frames, duration=1.0 / max(fps, 1e-6), loop=0)
    return out
