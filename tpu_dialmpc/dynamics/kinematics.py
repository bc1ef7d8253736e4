"""Forward kinematics and CoM-frame quantities (MuJoCo mj_kinematics/mj_comPos/mj_comVel).

Design: one sample, no batch dim — batching comes from `vmap` over samples,
which turns every per-body 3-vector op into a (Nsample, 3) VPU op.  Loops over
bodies are unrolled at trace time (nbody ≤ ~21 for Go2/H1), so all indexing is
static and XLA fuses the whole stage.

Conventions follow MuJoCo: 6D motion/force vectors are [angular(3); linear(3)],
all expressed in the world frame anchored at the kinematic root's subtree CoM.
Replaces the reference's reliance on the MuJoCo binary (pipeline shims at
dial_mpc_eigen/include/unitree-go2-env.h:215-242).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from tpu_dialmpc.core.rotations import (
    axis_angle_quat,
    normalize_quat,
    quat_mul,
    quat_to_mat,
    rotate,
)
from tpu_dialmpc.dynamics.model import (
    JNT_FREE,
    JNT_HINGE,
    JNT_SLIDE,
    PhysicsModel,
)


class Kinematics(NamedTuple):
    xpos: jnp.ndarray  # (nbody, 3) body frame origins
    xquat: jnp.ndarray  # (nbody, 4)
    xipos: jnp.ndarray  # (nbody, 3) inertial frame origins
    ximat: jnp.ndarray  # (nbody, 3, 3)
    xanchor: jnp.ndarray  # (njnt, 3) joint anchors
    xaxis: jnp.ndarray  # (njnt, 3) joint axes
    geom_xpos: jnp.ndarray  # (ngeom, 3)
    geom_xmat: jnp.ndarray  # (ngeom, 3, 3)
    site_xpos: jnp.ndarray  # (nsite, 3)
    subtree_com: jnp.ndarray  # (nbody, 3)
    cinert: jnp.ndarray  # (nbody, 6, 6) spatial inertia in com-anchored frame
    cdof: jnp.ndarray  # (nv, 6)


class Velocity(NamedTuple):
    cvel: jnp.ndarray  # (nbody, 6)
    cdof_dot: jnp.ndarray  # (nv, 6)


def _jnt_dofnum(jnt_type: int) -> int:
    return {JNT_FREE: 6, JNT_SLIDE: 1, JNT_HINGE: 1}[jnt_type]


def motion_cross(v: jnp.ndarray, m: jnp.ndarray) -> jnp.ndarray:
    """Spatial motion cross product v ×ₘ m (mju_crossMotion), [ang; lin]."""
    ang = jnp.cross(v[..., :3], m[..., :3])
    lin = jnp.cross(v[..., :3], m[..., 3:]) + jnp.cross(v[..., 3:], m[..., :3])
    return jnp.concatenate([ang, lin], axis=-1)


def force_cross(v: jnp.ndarray, f: jnp.ndarray) -> jnp.ndarray:
    """Spatial force cross product v ×f f (mju_crossForce), [ang; lin]."""
    ang = jnp.cross(v[..., :3], f[..., :3]) + jnp.cross(v[..., 3:], f[..., 3:])
    lin = jnp.cross(v[..., :3], f[..., 3:])
    return jnp.concatenate([ang, lin], axis=-1)


def _skew(v: jnp.ndarray) -> jnp.ndarray:
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], -1),
            jnp.stack([z, zero, -x], -1),
            jnp.stack([-y, x, zero], -1),
        ],
        -2,
    )


def kinematics(model: PhysicsModel, qpos: jnp.ndarray) -> Kinematics:
    """FK + CoM-position stage (mj_kinematics + mj_comPos equivalents)."""
    dtype = qpos.dtype
    nb = model.nbody

    xpos = [jnp.zeros(3, dtype)]
    xquat = [jnp.array([1.0, 0.0, 0.0, 0.0], dtype)]
    xanchor = [None] * model.njnt
    xaxis = [None] * model.njnt

    for b in range(1, nb):
        parent = int(model.body_parentid[b])
        pos = xpos[parent] + rotate(
            jnp.asarray(model.body_pos[b], dtype), xquat[parent]
        )
        quat = quat_mul(xquat[parent], jnp.asarray(model.body_quat[b], dtype))
        j = int(model.body_jntadr[b])
        if j >= 0:
            jt = int(model.jnt_type[j])
            qadr = int(model.jnt_qposadr[j])
            if jt == JNT_FREE:
                pos = qpos[qadr : qadr + 3]
                quat = normalize_quat(qpos[qadr + 3 : qadr + 7])
                xanchor[j] = pos
                xaxis[j] = jnp.asarray(model.jnt_axis[j], dtype)
            elif jt == JNT_SLIDE:
                axis_w = rotate(jnp.asarray(model.jnt_axis[j], dtype), quat)
                # anchor is at the reference (untranslated) joint position
                xanchor[j] = pos + rotate(jnp.asarray(model.jnt_pos[j], dtype), quat)
                pos = pos + axis_w * (qpos[qadr] - float(model.qpos0[qadr]))
                xaxis[j] = axis_w
            elif jt == JNT_HINGE:
                anchor = pos + rotate(jnp.asarray(model.jnt_pos[j], dtype), quat)
                qloc = axis_angle_quat(
                    jnp.asarray(model.jnt_axis[j], dtype),
                    qpos[qadr] - float(model.qpos0[qadr]),
                )
                quat = quat_mul(quat, qloc)
                pos = anchor - rotate(jnp.asarray(model.jnt_pos[j], dtype), quat)
                xanchor[j] = anchor
                xaxis[j] = rotate(jnp.asarray(model.jnt_axis[j], dtype), quat)
        xpos.append(pos)
        xquat.append(quat)

    xpos = jnp.stack(xpos)
    xquat = jnp.stack(xquat)

    xipos = xpos + rotate(jnp.asarray(model.body_ipos, dtype), xquat)
    ximat = quat_to_mat(quat_mul(xquat, jnp.asarray(model.body_iquat, dtype)))
    geom_xpos = xpos[model.geom_bodyid] + rotate(
        jnp.asarray(model.geom_pos, dtype), xquat[model.geom_bodyid]
    )
    geom_xmat = quat_to_mat(
        quat_mul(xquat[model.geom_bodyid], jnp.asarray(model.geom_quat, dtype))
    )
    site_xpos = xpos[model.site_bodyid] + rotate(
        jnp.asarray(model.site_pos, dtype), xquat[model.site_bodyid]
    )

    # ---- subtree CoM (backward accumulation over the tree) ----
    mass = jnp.asarray(model.body_mass, dtype)
    sub_mass = [mass[b] for b in range(nb)]
    sub_mpos = [mass[b] * xipos[b] for b in range(nb)]
    for b in range(nb - 1, 0, -1):
        parent = int(model.body_parentid[b])
        sub_mass[parent] = sub_mass[parent] + sub_mass[b]
        sub_mpos[parent] = sub_mpos[parent] + sub_mpos[b]
    subtree_com = jnp.stack(
        [sub_mpos[b] / jnp.maximum(sub_mass[b], 1e-12) for b in range(nb)]
    )

    # ---- spatial inertia in the com-anchored world frame ----
    root_com = subtree_com[model.body_rootid]  # (nbody, 3)
    c = xipos - root_com
    inert_c = (
        ximat
        * jnp.asarray(model.body_inertia, dtype)[:, None, :]
    ) @ ximat.transpose(0, 2, 1)
    chat = _skew(c)
    eye = jnp.eye(3, dtype=dtype)
    m_ = mass[:, None, None]
    upper_left = inert_c + m_ * (
        jnp.sum(c * c, -1)[:, None, None] * eye - c[:, None, :] * c[:, :, None]
    )
    upper_right = m_ * chat
    lower_left = -m_ * chat
    lower_right = m_ * jnp.broadcast_to(eye, (nb, 3, 3))
    cinert = jnp.concatenate(
        [
            jnp.concatenate([upper_left, upper_right], axis=-1),
            jnp.concatenate([lower_left, lower_right], axis=-1),
        ],
        axis=-2,
    )

    # ---- cdof: motion subspace per dof, in the com-anchored frame ----
    cdof = [None] * model.nv
    for j in range(model.njnt):
        b = int(model.jnt_bodyid[j])
        jt = int(model.jnt_type[j])
        adr = int(model.jnt_dofadr[j])
        com = subtree_com[int(model.body_rootid[b])]
        zeros3 = jnp.zeros(3, dtype)
        if jt == JNT_FREE:
            for i in range(3):
                e = jnp.zeros(3, dtype).at[i].set(1.0)
                cdof[adr + i] = jnp.concatenate([zeros3, e])
            R = quat_to_mat(xquat[b])
            for i in range(3):
                ax = R[:, i]
                cdof[adr + 3 + i] = jnp.concatenate(
                    [ax, jnp.cross(ax, com - xpos[b])]
                )
        elif jt == JNT_SLIDE:
            cdof[adr] = jnp.concatenate([zeros3, xaxis[j]])
        elif jt == JNT_HINGE:
            cdof[adr] = jnp.concatenate(
                [xaxis[j], jnp.cross(xaxis[j], com - xanchor[j])]
            )
    cdof = jnp.stack(cdof)

    return Kinematics(
        xpos=xpos,
        xquat=xquat,
        xipos=xipos,
        ximat=ximat,
        xanchor=jnp.stack([a for a in xanchor]) if model.njnt else jnp.zeros((0, 3)),
        xaxis=jnp.stack([a for a in xaxis]) if model.njnt else jnp.zeros((0, 3)),
        geom_xpos=geom_xpos,
        geom_xmat=geom_xmat,
        site_xpos=site_xpos,
        subtree_com=subtree_com,
        cinert=cinert,
        cdof=cdof,
    )


def com_vel(model: PhysicsModel, kin: Kinematics, qvel: jnp.ndarray) -> Velocity:
    """Body spatial velocities + cdof time derivatives (mj_comVel equivalent)."""
    nb = model.nbody
    dtype = qvel.dtype
    cvel = [jnp.zeros(6, dtype)]
    cdof_dot = [None] * model.nv

    for b in range(1, nb):
        parent = int(model.body_parentid[b])
        v = cvel[parent]
        j = int(model.body_jntadr[b])
        if j >= 0:
            jt = int(model.jnt_type[j])
            adr = int(model.jnt_dofadr[j])
            if jt == JNT_FREE:
                for i in range(3):
                    cdof_dot[adr + i] = jnp.zeros(6, dtype)
                v = v + kin.cdof[adr : adr + 3].T @ qvel[adr : adr + 3]
                for i in range(3, 6):
                    cdof_dot[adr + i] = motion_cross(v, kin.cdof[adr + i])
                v = v + kin.cdof[adr + 3 : adr + 6].T @ qvel[adr + 3 : adr + 6]
            else:
                cdof_dot[adr] = motion_cross(v, kin.cdof[adr])
                v = v + kin.cdof[adr] * qvel[adr]
        cvel.append(v)

    return Velocity(cvel=jnp.stack(cvel), cdof_dot=jnp.stack(cdof_dot))
