"""Physics pipeline: init / substepped step over a functional state pytree.

TPU-native counterpart of the reference's pipeline shims
(dial_mpc_eigen/include/unitree-go2-env.h:215-242) which call mj_forward /
mj_step on a single shared mjData.  Here state is a pure pytree, so every
vmapped sample rolls out from its own snapshot — fixing reference quirk Q1
(shared mutable mjData across candidate rollouts) by construction.

Semantics note (matches MuJoCo/MJX): `mj_step` runs forward dynamics on the
current state and then integrates, so the derived kinematic quantities stored
in the returned state correspond to the *pre-integration* configuration of the
last substep — exactly what the reference env reads after `mj_step`
(unitree-go2-env.h:433, 461-558).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from tpu_dialmpc.core.rotations import quat_integrate
from tpu_dialmpc.dynamics import (
    collision,
    constraint,
    kinematics,
    linalg,
    smooth,
    solver,
)
from tpu_dialmpc.dynamics.model import JNT_FREE, PhysicsModel


class PipelineState(NamedTuple):
    qpos: jnp.ndarray  # (nq,)
    qvel: jnp.ndarray  # (nv,)
    qacc_warmstart: jnp.ndarray  # (nv,)
    # derived quantities from the last forward pass (see module docstring)
    xpos: jnp.ndarray  # (nbody, 3)
    xquat: jnp.ndarray  # (nbody, 4)
    site_xpos: jnp.ndarray  # (nsite, 3)
    subtree_com: jnp.ndarray  # (nbody, 3)
    cvel: jnp.ndarray  # (nbody, 6) [ang; lin] com-anchored
    qfrc_actuator: jnp.ndarray  # (nv,)
    efc_force: jnp.ndarray  # (nefc_max,) constraint forces


def _get_cparams(model: PhysicsModel):
    # cached on the instance itself: an id()-keyed global dict is unsound
    # because ids are reused after garbage collection (a stale entry from a
    # dead model with different shapes would be returned for a new one)
    cp = getattr(model, "_cparams_cache", None)
    if cp is None:
        cp = collision.contact_params(model)
        object.__setattr__(model, "_cparams_cache", cp)
    return cp


def _forward(model: PhysicsModel, qpos, qvel, ctrl):
    """One forward-dynamics pass: returns (qacc, derived pack)."""
    cparams = _get_cparams(model)
    kin = kinematics.kinematics(model, qpos)
    vel = kinematics.com_vel(model, kin, qvel)
    m_mat = smooth.crb_mass_matrix(model, kin)
    qfrc_actuator = smooth.actuator_force(model, ctrl, qpos, qvel)
    qfrc_smooth = (
        smooth.passive_force(model, qvel)
        + qfrc_actuator
        - smooth.rne_bias(model, kin, vel, qvel)
    )
    qacc_smooth = linalg.solve_psd(m_mat, qfrc_smooth)
    contacts = collision.collide(model, kin)
    con = constraint.make_constraints(model, kin, qpos, qvel, contacts, cparams)
    return kin, vel, m_mat, qacc_smooth, con, qfrc_actuator


def _vel_to_qpos_map(model: PhysicsModel) -> np.ndarray:
    """(nq, nv) matrix scattering linear dof velocities into qpos slots
    (zero rows for quaternion components, handled separately)."""
    S = getattr(model, "_vel_map_cache", None)
    if S is None:
        S = np.zeros((model.nq, model.nv))
        for j in range(model.njnt):
            jt = int(model.jnt_type[j])
            qadr = int(model.jnt_qposadr[j])
            dadr = int(model.jnt_dofadr[j])
            if jt == JNT_FREE:
                for i in range(3):
                    S[qadr + i, dadr + i] = 1.0
            else:
                S[qadr, dadr] = 1.0
        object.__setattr__(model, "_vel_map_cache", S)
    return S


def _integrate_pos(model: PhysicsModel, qpos, qvel, dt):
    """Semi-implicit position update (mj_integratePos).

    One matvec handles every linear qpos slot; only free-joint quaternions
    need a dynamic-update-slice (1 per free joint).
    """
    S = jnp.asarray(_vel_to_qpos_map(model), qpos.dtype)
    out = qpos + dt * (S @ qvel)
    for j in range(model.njnt):
        if int(model.jnt_type[j]) != JNT_FREE:
            continue
        qadr = int(model.jnt_qposadr[j])
        dadr = int(model.jnt_dofadr[j])
        quat = quat_integrate(
            qpos[qadr + 3 : qadr + 7], qvel[dadr + 3 : dadr + 6], dt
        )
        out = out.at[qadr + 3 : qadr + 7].set(quat)
    return out


def init(model: PhysicsModel, qpos: jnp.ndarray, qvel: jnp.ndarray) -> PipelineState:
    """mj_forward equivalent: populate derived fields at (qpos, qvel)."""
    ctrl = jnp.zeros(model.nu, qpos.dtype)
    kin, vel, m_mat, qacc_smooth, con, qfrc_actuator = _forward(
        model, qpos, qvel, ctrl
    )
    # mj_resetData zeroes qacc_warmstart and mj_forward does NOT update it —
    # only mj_step saves qacc into qacc_warmstart.  With the truncated
    # (iterations=2) Newton solver the starting point is observable, so the
    # reset state must carry a ZERO warmstart for the first step, exactly
    # like the oracle's reset→forward→step sequence.
    res = solver.solve(model, m_mat, qacc_smooth, jnp.zeros_like(qacc_smooth), con)
    return PipelineState(
        qpos=qpos,
        qvel=qvel,
        qacc_warmstart=jnp.zeros_like(qacc_smooth),
        xpos=kin.xpos,
        xquat=kin.xquat,
        site_xpos=kin.site_xpos,
        subtree_com=kin.subtree_com,
        cvel=vel.cvel,
        qfrc_actuator=qfrc_actuator,
        efc_force=res.efc_force,
    )


def step(
    model: PhysicsModel,
    state: PipelineState,
    ctrl: jnp.ndarray,
    n_substeps: int = 1,
) -> PipelineState:
    """Advance physics by n_substeps * model.timestep under constant ctrl."""
    dt = model.timestep

    # mj_Euler integrates velocity implicitly w.r.t. joint damping when any
    # dof_damping is nonzero (and mjDSBL_EULERDAMP is off): it re-solves
    #   (M + h·diag(B)) qacc_int = qfrc_smooth + qfrc_constraint
    # while d.qacc (→ warmstart) keeps the constraint-solver acceleration.
    # qfrc_smooth is recovered exactly as M @ qacc_smooth.
    implicit_damp = bool(model.eulerdamp) and bool((model.dof_damping != 0).any())

    def substep(s: PipelineState, _):
        kin, vel, m_mat, qacc_smooth, con, qfrc_actuator = _forward(
            model, s.qpos, s.qvel, ctrl
        )
        res = solver.solve(model, m_mat, qacc_smooth, s.qacc_warmstart, con)
        if implicit_damp:
            damp = jnp.asarray(model.dof_damping, s.qvel.dtype)
            mhb = m_mat + dt * jnp.diag(damp)
            qfrc = m_mat @ qacc_smooth + res.qfrc_constraint
            qacc_int = linalg.solve_psd(mhb, qfrc)
        else:
            qacc_int = res.qacc
        qvel_new = s.qvel + dt * qacc_int
        qpos_new = _integrate_pos(model, s.qpos, qvel_new, dt)
        return (
            PipelineState(
                qpos=qpos_new,
                qvel=qvel_new,
                qacc_warmstart=res.qacc,
                xpos=kin.xpos,
                xquat=kin.xquat,
                site_xpos=kin.site_xpos,
                subtree_com=kin.subtree_com,
                cvel=vel.cvel,
                qfrc_actuator=qfrc_actuator,
                efc_force=res.efc_force,
            ),
            None,
        )

    if n_substeps == 1:
        return substep(state, None)[0]
    out, _ = jax.lax.scan(substep, state, None, length=n_substeps)
    return out
