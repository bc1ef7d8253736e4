"""IK / keyframe probe tool.

Rebuild of the reference's legged_robot_ik.cpp (dial_mpc/src/legged_robot_ik.cpp):
its commented-out first half runs Jacobian IK to keep the feet planted while
translating the base (:9-132); the live half shifts the base qpos, steps the
sim to settle, and prints the joint angles (:166-227) — a utility for
generating target keyframes.

Here both modes are proper JAX routines over the batched kinematics:

- `solve_feet_ik`: Gauss-Newton on the foot-site world positions with the base
  pose frozen at an offset — damped least squares on the (n_feet*3, n_joint)
  site Jacobian from dynamics/constraint.py's cdof-based point jacobian.
- `settle_probe`: shift the base, hold the home pose with the env's PD law,
  and step physics until quiescent (the live reference behavior).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from tpu_dialmpc.dynamics import kinematics
from tpu_dialmpc.dynamics.constraint import point_jacobian


def solve_feet_ik(
    env,
    base_offset,
    iters: int = 20,
    damping: float = 1e-4,
):
    """Joint angles keeping feet at their home world positions after shifting
    the base by `base_offset` (3,).  Returns (qpos, residual_norm)."""
    model = env.model
    q0 = jnp.asarray(env._init_q, jnp.float32)
    kin0 = kinematics.kinematics(model, q0)
    feet = np.asarray(env._feet_site_id)
    targets = kin0.site_xpos[feet]  # (n_feet, 3) world positions to hold

    q = q0.at[0:3].add(jnp.asarray(base_offset, jnp.float32))
    joint_slice = slice(7, model.nq)
    dof_slice = slice(6, model.nv)

    def body(q, _):
        kin = kinematics.kinematics(model, q)
        res = (kin.site_xpos[feet] - targets).reshape(-1)  # (3*n_feet,)
        jac_rows = []
        for k in range(feet.shape[0]):
            body_id = int(model.site_bodyid[feet[k]])
            jp = point_jacobian(model, kin, kin.site_xpos[feet[k]], body_id)
            jac_rows.append(jp[dof_slice].T)  # (3, n_joint)
        J = jnp.concatenate(jac_rows, axis=0)  # (3*n_feet, n_joint)
        JtJ = J.T @ J + damping * jnp.eye(J.shape[1], dtype=q.dtype)
        dq = jnp.linalg.solve(JtJ, J.T @ res)
        q = q.at[joint_slice].add(-dq)
        return q, jnp.linalg.norm(res)

    q, res_norms = jax.lax.scan(body, q, None, length=iters)
    kin = kinematics.kinematics(model, q)
    final_res = jnp.linalg.norm(
        (kin.site_xpos[feet] - targets).reshape(-1)
    )
    return q, final_res


def settle_probe(env, base_offset, n_steps: int = 400):
    """Reference live-half behavior (legged_robot_ik.cpp:166-227): shift the
    base, PD-hold the home pose, step physics to settle; returns final qpos."""
    from tpu_dialmpc.dynamics import pipeline

    model = env.model
    q0 = jnp.asarray(env._init_q, jnp.float32)
    q0 = q0.at[0:3].add(jnp.asarray(base_offset, jnp.float32))
    ps = pipeline.init(model, q0, jnp.zeros(model.nv, jnp.float32))

    home_joints = jnp.asarray(env._init_q[7:], jnp.float32)

    @jax.jit
    def run(ps):
        def body(ps, _):
            q = ps.qpos[7:]
            qd = ps.qvel[6:]
            tau = env.config.kp * (home_joints - q) - env.config.kd * qd
            ps2 = pipeline.step(model, ps, tau, n_substeps=1)
            return ps2, None

        ps, _ = jax.lax.scan(body, ps, None, length=n_steps)
        return ps

    return run(ps).qpos
