"""Quaternion / rotation math (w, x, y, z convention, MuJoCo-compatible).

Counterpart of the reference helpers at dial_mpc_eigen/include/unitree-go2-env.h:163-210
(`quatToYaw`, `quat_inv`, `rotate`, `inv_rotate`, global/body velocity maps),
written as batched JAX ops: every function maps over arbitrary leading axes, so
`vmap`/`shard_map` over samples is free.

Known reference divergence: the C++ `quatToYaw` goes through Eigen's
`eulerAngles(2,1,0)`, whose first angle is restricted to [0, π] (it may return
the alternate Euler decomposition with flipped roll/pitch).  `quat_to_yaw` here
uses the standard atan2 extraction in (-π, π], matching the upstream Python
semantics the C++ claims to replicate.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = [
    "quat_mul",
    "quat_inv",
    "rotate",
    "inv_rotate",
    "quat_to_mat",
    "axis_angle_quat",
    "quat_integrate",
    "quat_to_yaw",
    "quat_to_yaw_eigen",
    "normalize_quat",
    "global_to_body_velocity",
    "local_to_global_velocity",
]


def quat_mul(p: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product p ⊗ q, (..., 4)."""
    pw, px, py, pz = p[..., 0], p[..., 1], p[..., 2], p[..., 3]
    qw, qx, qy, qz = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            pw * qw - px * qx - py * qy - pz * qz,
            pw * qx + px * qw + py * qz - pz * qy,
            pw * qy - px * qz + py * qw + pz * qx,
            pw * qz + px * qy - py * qx + pz * qw,
        ],
        axis=-1,
    )


def quat_inv(q: jnp.ndarray) -> jnp.ndarray:
    """Conjugate of a unit quaternion (unitree-go2-env.h:172-177)."""
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def rotate(v: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """Rotate vector(s) v by quaternion(s) q, Rodrigues form (unitree-go2-env.h:179-186).

    r = 2 u (u·v) + (s² − u·u) v + 2 s (u × v)
    """
    s = q[..., :1]
    u = q[..., 1:]
    return (
        2.0 * u * jnp.sum(u * v, axis=-1, keepdims=True)
        + (s * s - jnp.sum(u * u, axis=-1, keepdims=True)) * v
        + 2.0 * s * jnp.cross(u, v)
    )


def inv_rotate(v: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """Rotate by the inverse quaternion (unitree-go2-env.h:188-192)."""
    return rotate(v, quat_inv(q))


def global_to_body_velocity(v: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """World-frame vector → body frame (unitree-go2-env.h:197-201)."""
    return inv_rotate(v, q)


def local_to_global_velocity(v: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """Body-frame vector → world frame (unitree-go2-env.h:206-210)."""
    return rotate(v, q)


def quat_to_mat(q: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) quaternion → (..., 3, 3) rotation matrix."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r = jnp.stack(
        [
            1 - 2 * (y * y + z * z),
            2 * (x * y - w * z),
            2 * (x * z + w * y),
            2 * (x * y + w * z),
            1 - 2 * (x * x + z * z),
            2 * (y * z - w * x),
            2 * (x * z - w * y),
            2 * (y * z + w * x),
            1 - 2 * (x * x + y * y),
        ],
        axis=-1,
    )
    return r.reshape(q.shape[:-1] + (3, 3))


def axis_angle_quat(axis: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    """Unit axis (..., 3) + angle (...) → quaternion (..., 4)."""
    half = 0.5 * angle
    s = jnp.sin(half)
    return jnp.concatenate(
        [jnp.cos(half)[..., None], axis * s[..., None]], axis=-1
    )


def quat_integrate(q: jnp.ndarray, omega_local: jnp.ndarray, dt) -> jnp.ndarray:
    """Integrate unit quaternion by body-frame angular velocity over dt.

    MuJoCo `mju_quatIntegrate` semantics: q ← q ⊗ exp(½ ω_local dt), then
    renormalize.  Safe at ω → 0 via the sinc expression.
    """
    theta = jnp.linalg.norm(omega_local, axis=-1) * dt
    half = 0.5 * theta
    # sin(half)/theta with the θ→0 limit 0.5 (factor multiplies ω·dt below).
    small = theta < 1e-9
    sin_over = jnp.where(small, 0.5, jnp.sin(half) / jnp.where(small, 1.0, theta))
    dq = jnp.concatenate(
        [jnp.cos(half)[..., None], omega_local * (dt * sin_over)[..., None]],
        axis=-1,
    )
    return normalize_quat(quat_mul(q, dq))


def normalize_quat(q: jnp.ndarray) -> jnp.ndarray:
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_to_yaw(q: jnp.ndarray) -> jnp.ndarray:
    """Yaw (Z euler) in (-π, π] from (..., 4) quaternion."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.arctan2(2.0 * (w * z + x * y), 1.0 - 2.0 * (y * y + z * z))


def quat_to_yaw_eigen(q: jnp.ndarray) -> jnp.ndarray:
    """Eigen-`eulerAngles(2,1,0)`-compatible yaw, range [0, π].

    The reference's `quatToYaw` (unitree-go2-env.h:163-170) takes the FIRST
    angle of Eigen's euler decomposition, which Eigen restricts to [0, π]:
    for Z-Y-X order res[0] = atan2(R10, R00) and, when that is negative,
    Eigen switches to the alternate decomposition res[0] += π (flipping
    pitch/roll to compensate).  So whenever the true yaw is negative the C++
    sees yaw+π — an ~π discontinuity that feeds `reward_yaw` and therefore
    the softmax weights.  This replicates that semantics exactly for the
    reference-parity path; `quat_to_yaw` is the corrected default.
    """
    yaw = quat_to_yaw(q)
    pi = jnp.asarray(np.pi, yaw.dtype)
    return jnp.where(yaw < 0.0, yaw + pi, yaw)
