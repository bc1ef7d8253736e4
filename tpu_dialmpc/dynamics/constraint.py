"""Constraint row (efc) assembly: friction loss, joint limits, pyramidal contacts.

Static-shape analog of MuJoCo's mj_makeConstraint/mj_instantiate* stages: the
row count is fixed per model, each row carries an `active` mask.  Row order
matches MuJoCo (friction, limits, contacts) so oracle tests can compare efc_*
arrays directly; limits emit two rows (lower/upper) per limited joint where
MuJoCo emits only the active side — inactive rows are masked out.

Soft-constraint parameterization follows the MuJoCo computation spec:
  imp(x): solimp = (dmin, dmax, width, midpoint, power) impedance sigmoid
  aref   = -b·(J qvel) - k·imp·(pos - margin),  k,b from solref
  R      = (1-imp)/imp · diagApprox,  D = 1/R
(diagApprox: pyramidal contact rows 2·(1+μ²)·invweight, limits/friction rows
dof_invweight0 — verified row-exact against mjData.efc_D.)
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from tpu_dialmpc.dynamics.collision import ContactParams, Contacts
from tpu_dialmpc.dynamics.kinematics import Kinematics
from tpu_dialmpc.dynamics.model import JNT_HINGE, JNT_SLIDE, PhysicsModel

MJ_MINVAL = 1e-15
MJ_MINIMP = 0.0001
MJ_MAXIMP = 0.9999


class Constraints(NamedTuple):
    J: jnp.ndarray  # (nefc, nv)
    pos: jnp.ndarray  # (nefc,) constraint "position" (dist for contacts)
    margin: jnp.ndarray  # (nefc,)
    aref: jnp.ndarray  # (nefc,)
    D: jnp.ndarray  # (nefc,) inverse regularizer
    active: jnp.ndarray  # (nefc,) bool — row exists this step
    floss: jnp.ndarray  # (nefc,) frictionloss (>0 marks Huber rows)


def impedance(solimp: jnp.ndarray, pos: jnp.ndarray, margin: jnp.ndarray):
    """MuJoCo impedance sigmoid d(x), x = |pos - margin| / width."""
    dmin, dmax, width, mid, power = (
        solimp[..., 0],
        solimp[..., 1],
        solimp[..., 2],
        solimp[..., 3],
        solimp[..., 4],
    )
    x = jnp.clip(jnp.abs(pos - margin) / jnp.maximum(width, MJ_MINVAL), 0.0, 1.0)
    mid = jnp.clip(mid, MJ_MINIMP, MJ_MAXIMP)
    power = jnp.maximum(power, 1.0)
    a = 1.0 / jnp.power(mid, power - 1.0)
    b = 1.0 / jnp.power(1.0 - mid, power - 1.0)
    y = jnp.where(
        x <= mid, a * jnp.power(x, power), 1.0 - b * jnp.power(1.0 - x, power)
    )
    return jnp.clip(dmin + y * (dmax - dmin), MJ_MINIMP, MJ_MAXIMP)


def _kb(solref: jnp.ndarray, dmax: jnp.ndarray):
    """Stiffness/damping from solref (standard positive or direct negative)."""
    timeconst, dampratio = solref[..., 0], solref[..., 1]
    std_k = 1.0 / jnp.maximum(
        dmax * dmax * timeconst * timeconst * dampratio * dampratio, MJ_MINVAL
    )
    std_b = 2.0 / jnp.maximum(dmax * timeconst, MJ_MINVAL)
    direct = (timeconst <= 0) | (dampratio <= 0)
    k = jnp.where(direct, -timeconst / jnp.maximum(dmax * dmax, MJ_MINVAL), std_k)
    b = jnp.where(direct, -dampratio, std_b)
    return k, b


def aref_and_d(solref, solimp, diag_approx, pos, margin, vel):
    """Reference acceleration and inverse regularizer D for one (batch of) rows."""
    imp = impedance(solimp, pos, margin)
    k, b = _kb(solref, solimp[..., 1])
    aref = -b * vel - k * imp * (pos - margin)
    r = jnp.maximum((1.0 - imp) / imp * diag_approx, MJ_MINVAL)
    return aref, 1.0 / r


def point_jacobian(
    model: PhysicsModel, kin: Kinematics, point: jnp.ndarray, body: int
) -> jnp.ndarray:
    """(nv, 3) translational jacobian of world `point` on `body` (mj_jac)."""
    com = kin.subtree_com[int(model.body_rootid[body])]
    offset = point - com
    jac = kin.cdof[:, 3:] + jnp.cross(kin.cdof[:, :3], offset[None, :])
    mask = jnp.asarray(model.body_dof_mask[body], jac.dtype)
    return jac * mask[:, None]


def make_constraints(
    model: PhysicsModel,
    kin: Kinematics,
    qpos: jnp.ndarray,
    qvel: jnp.ndarray,
    contacts: Contacts,
    cparams: ContactParams,
) -> Constraints:
    dtype = qvel.dtype
    nv = model.nv
    rows = []  # list of (J, pos, margin, aref, D, active, floss)

    # ---- dof friction loss (always active, Huber cost) ----
    for d in range(nv):
        fl = float(model.dof_frictionloss[d])
        if fl <= 0:
            continue
        J = jnp.zeros(nv, dtype).at[d].set(1.0)
        zero = jnp.asarray(0.0, dtype)
        aref, D = aref_and_d(
            jnp.asarray(model.dof_solref[d], dtype),
            jnp.asarray(model.dof_solimp[d], dtype),
            jnp.asarray(model.dof_invweight0[d], dtype),
            zero,
            zero,
            qvel[d],
        )
        rows.append((J, zero, zero, aref, D, jnp.asarray(True), fl))

    # ---- joint limits: lower and upper row per limited joint ----
    for j in range(model.njnt):
        if not model.jnt_limited[j]:
            continue
        if int(model.jnt_type[j]) not in (JNT_HINGE, JNT_SLIDE):
            continue
        qadr = int(model.jnt_qposadr[j])
        dadr = int(model.jnt_dofadr[j])
        lo, hi = float(model.jnt_range[j, 0]), float(model.jnt_range[j, 1])
        margin = jnp.asarray(model.jnt_margin[j], dtype)
        solref = jnp.asarray(model.jnt_solref[j], dtype)
        solimp = jnp.asarray(model.jnt_solimp[j], dtype)
        iw = jnp.asarray(model.dof_invweight0[dadr], dtype)
        for sign, bound in ((1.0, lo), (-1.0, hi)):
            # dist > 0 away from the limit, negative when violated
            dist = jnp.asarray(sign, dtype) * (qpos[qadr] - bound)
            J = jnp.zeros(nv, dtype).at[dadr].set(sign)
            vel = jnp.asarray(sign, dtype) * qvel[dadr]
            aref, D = aref_and_d(solref, solimp, iw, dist, margin, vel)
            rows.append((J, dist, margin, aref, D, dist < margin, 0.0))

    # ---- contacts (pyramidal) ----
    ncon = int(cparams.body1.shape[0])
    for k in range(ncon):
        b1, b2 = int(cparams.body1[k]), int(cparams.body2[k])
        condim = int(cparams.condim[k])
        dist = contacts.dist[k]
        margin = jnp.asarray(cparams.includemargin[k], dtype)
        active = dist < margin
        frame = contacts.frame[k]  # rows n, t1, t2
        jac_rel = (
            point_jacobian(model, kin, contacts.pos[k], b2)
            - point_jacobian(model, kin, contacts.pos[k], b1)
        )  # (nv, 3) world
        j_n = jac_rel @ frame[0]
        solref = jnp.asarray(cparams.solref[k], dtype)
        solimp = jnp.asarray(cparams.solimp[k], dtype)
        iw = jnp.asarray(cparams.invweight[k], dtype)
        if condim == 1:
            vel = j_n @ qvel
            aref, D = aref_and_d(solref, solimp, iw, dist, margin, vel)
            rows.append((j_n, dist, margin, aref, D, active, 0.0))
        elif condim == 3:
            for t in range(2):
                mu = jnp.asarray(cparams.friction[k, t], dtype)
                j_t = jac_rel @ frame[t + 1]
                # MuJoCo mj_diagApprox: pyramidal rows use 2·(1+μ²)·invweight
                diag = 2.0 * (iw + mu * mu * iw)
                for s in (1.0, -1.0):
                    J = j_n + jnp.asarray(s, dtype) * mu * j_t
                    vel = J @ qvel
                    aref, D = aref_and_d(solref, solimp, diag, dist, margin, vel)
                    rows.append((J, dist, margin, aref, D, active, 0.0))
        else:
            raise NotImplementedError(f"condim {condim} not supported")

    if not rows:
        z = jnp.zeros((0,), dtype)
        return Constraints(
            J=jnp.zeros((0, nv), dtype),
            pos=z,
            margin=z,
            aref=z,
            D=z,
            active=jnp.zeros((0,), bool),
            floss=z,
        )

    return Constraints(
        J=jnp.stack([r[0] for r in rows]),
        pos=jnp.stack([jnp.asarray(r[1], dtype) for r in rows]),
        margin=jnp.stack([jnp.asarray(r[2], dtype) for r in rows]),
        aref=jnp.stack([jnp.asarray(r[3], dtype) for r in rows]),
        D=jnp.stack([jnp.asarray(r[4], dtype) for r in rows]),
        active=jnp.stack([jnp.asarray(r[5]) for r in rows]),
        floss=jnp.stack([jnp.asarray(r[6], dtype) for r in rows]),
    )
