"""Kinematics / mass-matrix / bias-force parity vs the CPU MuJoCo oracle."""

import mujoco
import numpy as np
import pytest

from tpu_dialmpc.dynamics import assets, compile_model
from tpu_dialmpc.dynamics import kinematics as K
from tpu_dialmpc.dynamics import smooth


def _setup(scene, seed, vel_scale=1.0):
    m = assets.load_mj_model(scene)
    model = compile_model(m)
    d = mujoco.MjData(m)
    rng = np.random.default_rng(seed)
    qpos = m.qpos0.copy()
    if m.nkey:
        qpos = m.key_qpos[0].copy()
    qpos += rng.normal(scale=0.1, size=m.nq)
    # renormalize free-joint quaternions
    for j in range(m.njnt):
        if m.jnt_type[j] == 0:
            a = m.jnt_qposadr[j] + 3
            qpos[a : a + 4] /= np.linalg.norm(qpos[a : a + 4])
    qvel = rng.normal(scale=vel_scale, size=m.nv)
    d.qpos[:] = qpos
    d.qvel[:] = qvel
    mujoco.mj_forward(m, d)
    return m, model, d, qpos, qvel


SCENES = ["go2_force", "h1_walk", "h1_push_crate"]


@pytest.mark.parametrize("scene", SCENES)
def test_kinematics_matches_mujoco(scene):
    m, model, d, qpos, qvel = _setup(scene, 0)
    kin = K.kinematics(model, qpos)

    np.testing.assert_allclose(np.asarray(kin.xpos), d.xpos, atol=1e-8)
    # quaternions up to sign
    q_got = np.asarray(kin.xquat)
    sign = np.sign(np.sum(q_got * d.xquat, axis=-1, keepdims=True))
    np.testing.assert_allclose(q_got * sign, d.xquat, atol=1e-8)
    np.testing.assert_allclose(np.asarray(kin.xipos), d.xipos, atol=1e-8)
    np.testing.assert_allclose(np.asarray(kin.site_xpos), d.site_xpos, atol=1e-8)
    np.testing.assert_allclose(
        np.asarray(kin.geom_xpos), d.geom_xpos[model.geom_orig_id], atol=1e-8
    )
    np.testing.assert_allclose(np.asarray(kin.subtree_com), d.subtree_com, atol=1e-8)
    np.testing.assert_allclose(np.asarray(kin.xanchor), d.xanchor, atol=1e-8)
    np.testing.assert_allclose(np.asarray(kin.xaxis), d.xaxis, atol=1e-8)
    np.testing.assert_allclose(np.asarray(kin.cdof), d.cdof, atol=1e-8)


@pytest.mark.parametrize("scene", SCENES)
def test_com_vel_matches_mujoco(scene):
    m, model, d, qpos, qvel = _setup(scene, 1)
    kin = K.kinematics(model, qpos)
    vel = K.com_vel(model, kin, np.asarray(qvel))
    np.testing.assert_allclose(np.asarray(vel.cvel), d.cvel, atol=1e-8)
    np.testing.assert_allclose(np.asarray(vel.cdof_dot), d.cdof_dot, atol=1e-8)


@pytest.mark.parametrize("scene", SCENES)
def test_mass_matrix_matches_mujoco(scene):
    m, model, d, qpos, qvel = _setup(scene, 2)
    kin = K.kinematics(model, qpos)
    m_got = np.asarray(smooth.crb_mass_matrix(model, kin))
    m_want = np.zeros((m.nv, m.nv))
    mujoco.mj_fullM(m, d, m_want)
    np.testing.assert_allclose(m_got, m_want, atol=1e-8)


@pytest.mark.parametrize("scene", SCENES)
def test_bias_force_matches_mujoco(scene):
    m, model, d, qpos, qvel = _setup(scene, 3)
    kin = K.kinematics(model, qpos)
    vel = K.com_vel(model, kin, np.asarray(qvel))
    bias = np.asarray(smooth.rne_bias(model, kin, vel, np.asarray(qvel)))
    np.testing.assert_allclose(bias, d.qfrc_bias, atol=1e-8)


@pytest.mark.parametrize("scene", SCENES)
def test_passive_and_actuation_match_mujoco(scene):
    m, model, d, qpos, qvel = _setup(scene, 4)
    rng = np.random.default_rng(5)
    ctrl = rng.normal(scale=5.0, size=m.nu)
    d.ctrl[:] = ctrl
    mujoco.mj_forward(m, d)
    np.testing.assert_allclose(
        np.asarray(smooth.passive_force(model, np.asarray(qvel))),
        d.qfrc_passive,
        atol=1e-8,
    )
    np.testing.assert_allclose(
        np.asarray(smooth.actuator_force(model, np.asarray(ctrl))),
        d.qfrc_actuator,
        atol=1e-8,
    )


@pytest.mark.parametrize("scene", SCENES)
def test_qacc_smooth_matches_mujoco(scene):
    """M qacc = qfrc_smooth end-to-end (constraints disabled in the oracle)."""
    m = assets.load_mj_model(scene)
    m.opt.disableflags |= mujoco.mjtDisableBit.mjDSBL_CONSTRAINT
    model = compile_model(m)
    d = mujoco.MjData(m)
    rng = np.random.default_rng(6)
    qpos = (m.key_qpos[0].copy() if m.nkey else m.qpos0.copy()) + rng.normal(
        scale=0.05, size=m.nq
    )
    for j in range(m.njnt):
        if m.jnt_type[j] == 0:
            a = m.jnt_qposadr[j] + 3
            qpos[a : a + 4] /= np.linalg.norm(qpos[a : a + 4])
    qvel = rng.normal(scale=0.5, size=m.nv)
    ctrl = rng.normal(scale=3.0, size=m.nu)
    d.qpos[:], d.qvel[:], d.ctrl[:] = qpos, qvel, ctrl
    mujoco.mj_forward(m, d)

    kin = K.kinematics(model, qpos)
    vel = K.com_vel(model, kin, qvel)
    m_mat = smooth.crb_mass_matrix(model, kin)
    qfrc = (
        smooth.passive_force(model, qvel)
        + smooth.actuator_force(model, ctrl)
        - smooth.rne_bias(model, kin, vel, qvel)
    )
    qacc = np.linalg.solve(np.asarray(m_mat), np.asarray(qfrc))
    np.testing.assert_allclose(qacc, d.qacc, atol=1e-7)
