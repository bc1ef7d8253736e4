"""Smooth (unconstrained) dynamics: CRB mass matrix, RNE bias, passive, actuation.

MuJoCo-equivalent stages (mj_crb, mj_rne, mj_passive, mj_fwdActuation) written
as unrolled tree recursions over static body indices; with `vmap` over samples
the mass-matrix assembly becomes one batched (nv,6)x(6,nv) matmul — MXU work.
"""

from __future__ import annotations

import jax.numpy as jnp

from tpu_dialmpc.dynamics.kinematics import (
    Kinematics,
    Velocity,
    force_cross,
)
from tpu_dialmpc.dynamics.model import PhysicsModel


def crb_mass_matrix(model: PhysicsModel, kin: Kinematics) -> jnp.ndarray:
    """Dense joint-space inertia matrix M (nv, nv), incl. armature.

    Composite-rigid-body: crb[b] = cinert[b] + Σ_children crb[child];
    M[i,j] = cdof[j]ᵀ crb[body(i)] cdof[i] for ancestor pairs, assembled as a
    single masked matmul.
    """
    nb = model.nbody
    crb = [kin.cinert[b] for b in range(nb)]
    for b in range(nb - 1, 0, -1):
        parent = int(model.body_parentid[b])
        crb[parent] = crb[parent] + crb[b]
    crb_per_dof = jnp.stack([crb[int(model.dof_bodyid[d])] for d in range(model.nv)])
    # F[i] = crb[body(i)] @ cdof[i]
    f = jnp.einsum("iab,ib->ia", crb_per_dof, kin.cdof)
    g = f @ kin.cdof.T  # g[i, j] = cdof[j]' crb[body(i)] cdof[i]
    mask_l = jnp.asarray(model.ancestor_mask, f.dtype)  # j ancestor-or-self of i
    strict = mask_l * (1.0 - jnp.eye(model.nv, dtype=f.dtype))
    m_mat = g * mask_l + (g * strict).T
    return m_mat + jnp.diag(jnp.asarray(model.dof_armature, f.dtype))


def rne_bias(
    model: PhysicsModel, kin: Kinematics, vel: Velocity, qvel: jnp.ndarray
) -> jnp.ndarray:
    """Bias force qfrc_bias = C(q, qvel) (mj_rne with flg_acc=0)."""
    nb = model.nbody
    dtype = qvel.dtype
    gravity = jnp.asarray(model.gravity, dtype)

    # forward: spatial accelerations (gravity as base acceleration, no qacc)
    cacc = [jnp.concatenate([jnp.zeros(3, dtype), -gravity])]
    for b in range(1, nb):
        parent = int(model.body_parentid[b])
        a = cacc[parent]
        j = int(model.body_jntadr[b])
        if j >= 0:
            adr = int(model.jnt_dofadr[j])
            ndof = 6 if int(model.jnt_type[j]) == 0 else 1
            a = a + vel.cdof_dot[adr : adr + ndof].T @ qvel[adr : adr + ndof]
        cacc.append(a)

    # body forces: f = I a + v ×f (I v)
    cfrc = []
    for b in range(nb):
        iv = kin.cinert[b] @ vel.cvel[b]
        cfrc.append(kin.cinert[b] @ cacc[b] + force_cross(vel.cvel[b], iv))

    # backward accumulate and project on cdof
    for b in range(nb - 1, 0, -1):
        parent = int(model.body_parentid[b])
        cfrc[parent] = cfrc[parent] + cfrc[b]
    cfrc = jnp.stack(cfrc)
    return jnp.einsum(
        "da,da->d", kin.cdof, cfrc[model.dof_bodyid]
    )


def passive_force(model: PhysicsModel, qvel: jnp.ndarray) -> jnp.ndarray:
    """qfrc_passive: joint damping (mj_passive; no springs/fluid in our models)."""
    return -jnp.asarray(model.dof_damping, qvel.dtype) * qvel


def actuator_force(
    model: PhysicsModel,
    ctrl: jnp.ndarray,
    qpos: jnp.ndarray | None = None,
    qvel: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """qfrc_actuator (mj_fwdActuation for fixed-gain, none/affine-bias actuators).

    Per actuator: force = gain·ctrl + b0 + b1·q + b2·q̇, clamped to forcerange,
    then scaled by gear and scattered to the target dof.  Covers both <motor>
    (gain=1, no bias) and <position kp kv> (gain=kp, bias=(0,-kp,-kv)) — the
    reference's two leg-control modes load different model XMLs for these
    (models/unitree_go2/mjx_go2_position.xml:16-34 vs mjx_go2_force.xml:244-257).
    """
    dtype = ctrl.dtype
    c = ctrl
    if bool(model.actuator_ctrllimited.any()):
        lo = jnp.asarray(model.actuator_ctrlrange[:, 0], dtype)
        hi = jnp.asarray(model.actuator_ctrlrange[:, 1], dtype)
        limited = jnp.asarray(model.actuator_ctrllimited)
        c = jnp.where(limited, jnp.clip(c, lo, hi), c)
    force = jnp.asarray(model.actuator_gainprm, dtype) * c
    bias = jnp.asarray(model.actuator_biasprm, dtype)  # (nu, 3)
    if bool((model.actuator_biasprm != 0).any()):
        if qpos is None or qvel is None:
            raise ValueError("affine-bias actuators need qpos/qvel")
        q = qpos[model.actuator_qposadr]
        qd = qvel[model.actuator_dofadr]
        force = force + bias[:, 0] + bias[:, 1] * q + bias[:, 2] * qd
    if bool(model.actuator_forcelimited.any()):
        lo = jnp.asarray(model.actuator_forcerange[:, 0], dtype)
        hi = jnp.asarray(model.actuator_forcerange[:, 1], dtype)
        limited = jnp.asarray(model.actuator_forcelimited)
        force = jnp.where(limited, jnp.clip(force, lo, hi), force)
    force = jnp.asarray(model.actuator_gear, dtype) * force
    qfrc = jnp.zeros(model.nv, dtype)
    return qfrc.at[model.actuator_dofadr].add(force)
