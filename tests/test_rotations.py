"""Quaternion op tests against scipy.spatial.transform as oracle."""

import numpy as np
from scipy.spatial.transform import Rotation as R

from tpu_dialmpc.core import rotations as rot


def _to_scipy(q_wxyz):
    q = np.asarray(q_wxyz)
    return R.from_quat(np.concatenate([q[..., 1:], q[..., :1]], axis=-1))


def _rand_quats(n, seed):
    rng = np.random.default_rng(seed)
    q = rng.standard_normal((n, 4))
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def test_rotate_matches_scipy():
    q = _rand_quats(32, 0)
    v = np.random.default_rng(1).standard_normal((32, 3))
    got = np.asarray(rot.rotate(v, q))
    want = _to_scipy(q).apply(v)
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_inv_rotate_roundtrip():
    q = _rand_quats(16, 2)
    v = np.random.default_rng(3).standard_normal((16, 3))
    back = np.asarray(rot.inv_rotate(rot.rotate(v, q), q))
    np.testing.assert_allclose(back, v, atol=1e-12)


def test_quat_mul_matches_scipy():
    p = _rand_quats(16, 4)
    q = _rand_quats(16, 5)
    got = _to_scipy(np.asarray(rot.quat_mul(p, q))).as_matrix()
    want = (_to_scipy(p) * _to_scipy(q)).as_matrix()
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_quat_to_mat_matches_scipy():
    q = _rand_quats(16, 6)
    np.testing.assert_allclose(
        np.asarray(rot.quat_to_mat(q)), _to_scipy(q).as_matrix(), atol=1e-12
    )


def test_quat_to_yaw():
    q = _rand_quats(64, 7)
    want = _to_scipy(q).as_euler("ZYX")[:, 0]
    np.testing.assert_allclose(np.asarray(rot.quat_to_yaw(q)), want, atol=1e-12)


def test_axis_angle_quat():
    rng = np.random.default_rng(8)
    axis = rng.standard_normal((16, 3))
    axis /= np.linalg.norm(axis, axis=-1, keepdims=True)
    angle = rng.uniform(-3, 3, 16)
    got = _to_scipy(np.asarray(rot.axis_angle_quat(axis, angle))).as_matrix()
    want = R.from_rotvec(axis * angle[:, None]).as_matrix()
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_quat_integrate_small_step_matches_rotvec():
    q = _rand_quats(8, 9)
    omega = np.random.default_rng(10).standard_normal((8, 3))
    dt = 1e-3
    got = np.asarray(rot.quat_integrate(q, omega, dt))
    want_rot = _to_scipy(q) * R.from_rotvec(omega * dt)
    np.testing.assert_allclose(
        _to_scipy(got).as_matrix(), want_rot.as_matrix(), atol=1e-10
    )


def test_quat_integrate_zero_velocity():
    q = _rand_quats(4, 11)
    got = np.asarray(rot.quat_integrate(q, np.zeros((4, 3)), 0.01))
    np.testing.assert_allclose(got, q, atol=1e-12)


def test_quat_to_yaw_eigen_clamped_range():
    """Eigen eulerAngles(2,1,0) first-angle semantics: atan2 yaw shifted into
    [0, π] (verified bit-exact against Eigen over 200k random quaternions —
    unitree-go2-env.h:163-170)."""
    q = _rand_quats(512, 21)
    yaw = np.asarray(rot.quat_to_yaw(q))
    yaw_e = np.asarray(rot.quat_to_yaw_eigen(q))
    assert np.all(yaw_e >= 0.0) and np.all(yaw_e <= np.pi + 1e-12)
    want = np.where(yaw < 0, yaw + np.pi, yaw)
    np.testing.assert_allclose(yaw_e, want, atol=1e-12)
    # scipy cross-check of the underlying atan2 yaw (uppercase = intrinsic)
    want_scipy = _to_scipy(q).as_euler("ZYX")[:, 0]
    np.testing.assert_allclose(yaw, want_scipy, atol=1e-9)
