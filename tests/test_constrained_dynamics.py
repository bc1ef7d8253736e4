"""Collision / constraint / Newton-solver parity vs the CPU MuJoCo oracle."""

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

from tpu_dialmpc.dynamics import assets, compile_model, pipeline
from tpu_dialmpc.dynamics import collision, constraint, solver
from tpu_dialmpc.dynamics import kinematics as K


def _efc_dense_J(m, d):
    J = np.zeros((d.nefc, m.nv))
    if d.efc_J.size == d.nefc * m.nv:
        return d.efc_J.reshape(d.nefc, m.nv)
    for r in range(d.nefc):
        adr, nnz = d.efc_J_rowadr[r], d.efc_J_rownnz[r]
        J[r, d.efc_J_colind[adr : adr + nnz]] = d.efc_J[adr : adr + nnz]
    return J


def _go2_state(seed, drop=0.006, limit_violation=False):
    m = assets.load_mj_model("go2_force")
    model = compile_model(m)
    d = mujoco.MjData(m)
    rng = np.random.default_rng(seed)
    qpos = m.key_qpos[0].copy()
    qpos[2] -= drop
    if limit_violation:
        qpos[7] = -1.2  # beyond abduction range ±1.0472
    qvel = rng.normal(scale=0.2, size=m.nv)
    d.qpos[:], d.qvel[:] = qpos, qvel
    mujoco.mj_forward(m, d)
    return m, model, d, qpos, qvel


def test_contacts_match_oracle():
    m, model, d, qpos, qvel = _go2_state(0)
    kin = K.kinematics(model, qpos)
    cons = collision.collide(model, kin)
    cp = collision.contact_params(model)
    # map oracle contacts by (geom1, geom2) original ids
    oracle = {
        (d.contact[i].geom1, d.contact[i].geom2): d.contact[i]
        for i in range(d.ncon)
    }
    n_active = 0
    for k in range(cp.geom1.shape[0]):
        key = (
            int(model.geom_orig_id[cp.geom1[k]]),
            int(model.geom_orig_id[cp.geom2[k]]),
        )
        active = float(cons.dist[k]) < cp.includemargin[k]
        if active:
            n_active += 1
            c = oracle[key]
            np.testing.assert_allclose(float(cons.dist[k]), c.dist, atol=1e-10)
            np.testing.assert_allclose(np.asarray(cons.pos[k]), c.pos, atol=1e-10)
            np.testing.assert_allclose(
                np.asarray(cons.frame[k]), c.frame.reshape(3, 3), atol=1e-10
            )
    assert n_active == d.ncon


def test_efc_rows_match_oracle():
    """J, pos, aref, D row-exact vs MuJoCo (limits + pyramidal contacts)."""
    m, model, d, qpos, qvel = _go2_state(0, limit_violation=True)
    J_or = _efc_dense_J(m, d)
    kin = K.kinematics(model, qpos)
    cons = collision.collide(model, kin)
    cp = collision.contact_params(model)
    con = constraint.make_constraints(model, kin, qpos, qvel, cons, cp)
    act = np.asarray(con.active)
    mine = [k for k in range(con.J.shape[0]) if act[k]]
    assert len(mine) == d.nefc
    for r, k in zip(range(d.nefc), mine):
        np.testing.assert_allclose(np.asarray(con.J[k]), J_or[r], atol=1e-10)
        np.testing.assert_allclose(float(con.pos[k]), d.efc_pos[r], atol=1e-10)
        np.testing.assert_allclose(float(con.aref[k]), d.efc_aref[r], atol=1e-8)
        np.testing.assert_allclose(float(con.D[k]), d.efc_D[r], rtol=1e-10)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_constrained_qacc_matches_oracle(seed):
    m, model, d, qpos, qvel = _go2_state(seed)
    rng = np.random.default_rng(seed + 100)
    ctrl = rng.normal(scale=5.0, size=m.nu)
    d.ctrl[:] = ctrl
    d.qacc_warmstart[:] = 0
    mujoco.mj_forward(m, d)
    kin, vel, m_mat, qacc_smooth, con, _ = pipeline._forward(
        model, jnp.asarray(qpos), jnp.asarray(qvel), jnp.asarray(ctrl)
    )
    res = solver.solve(model, m_mat, qacc_smooth, jnp.zeros(m.nv), con)
    np.testing.assert_allclose(np.asarray(res.qacc), d.qacc, atol=5e-6)


@pytest.mark.slow
def test_step_trajectory_parity_go2():
    """200 contact-rich mj_step calls stay within 1e-4 of the oracle."""
    m = assets.load_mj_model("go2_force")
    m.opt.timestep = 0.0025
    model = compile_model(m).with_options(timestep=0.0025)
    d = mujoco.MjData(m)
    qpos = m.key_qpos[0].copy()
    d.qpos[:] = qpos
    st = pipeline.init(model, jnp.asarray(qpos), jnp.zeros(m.nv))
    step_j = jax.jit(lambda s, c: pipeline.step(model, s, c, n_substeps=1))
    for k in range(200):
        ctrl = 3.0 * np.sin(0.01 * k + np.arange(12))
        d.ctrl[:] = ctrl
        mujoco.mj_step(m, d)
        st = step_j(st, jnp.asarray(ctrl))
    np.testing.assert_allclose(np.asarray(st.qpos), d.qpos, atol=1e-4)
    np.testing.assert_allclose(np.asarray(st.qvel), d.qvel, atol=1e-3)


@pytest.mark.slow
def test_step_trajectory_parity_h1():
    """H1 humanoid (capsule feet) trajectory parity."""
    m = assets.load_mj_model("h1_walk")
    model = compile_model(m)
    d = mujoco.MjData(m)
    qpos = m.key_qpos[0].copy() if m.nkey else m.qpos0.copy()
    d.qpos[:] = qpos
    st = pipeline.init(model, jnp.asarray(qpos), jnp.zeros(m.nv))
    step_j = jax.jit(lambda s, c: pipeline.step(model, s, c, n_substeps=1))
    for k in range(100):
        ctrl = 10.0 * np.sin(0.02 * k + np.arange(m.nu))
        d.ctrl[:] = ctrl
        mujoco.mj_step(m, d)
        st = step_j(st, jnp.asarray(ctrl))
    # capsule contacts flip active-state near the margin slightly differently
    # than MuJoCo's 1-or-2-contact plane-capsule; stays inside the 1e-3
    # north-star parity budget
    np.testing.assert_allclose(np.asarray(st.qpos), d.qpos, atol=1e-3)


@pytest.mark.slow
def test_step_trajectory_parity_go2_position():
    """<position kp kv> actuators (fixed gain + affine bias): 200-step parity."""
    m = assets.load_mj_model("go2_position")
    m.opt.timestep = 0.0025
    model = compile_model(m).with_options(timestep=0.0025)
    d = mujoco.MjData(m)
    qpos = m.key_qpos[0].copy()
    d.qpos[:] = qpos
    st = pipeline.init(model, jnp.asarray(qpos), jnp.zeros(m.nv))
    step_j = jax.jit(lambda s, c: pipeline.step(model, s, c, n_substeps=1))
    home = qpos[7:]
    for k in range(200):
        ctrl = home + 0.2 * np.sin(0.01 * k + np.arange(12))
        d.ctrl[:] = ctrl
        mujoco.mj_step(m, d)
        st = step_j(st, jnp.asarray(ctrl))
    np.testing.assert_allclose(np.asarray(st.qpos), d.qpos, atol=1e-4)
    np.testing.assert_allclose(np.asarray(st.qvel), d.qvel, atol=1e-3)


def test_qfrc_actuator_position_matches_oracle():
    m = assets.load_mj_model("go2_position")
    model = compile_model(m)
    d = mujoco.MjData(m)
    rng = np.random.default_rng(7)
    d.qpos[:] = m.key_qpos[0] + rng.normal(scale=0.05, size=m.nq)
    d.qvel[:] = rng.normal(scale=0.3, size=m.nv)
    d.ctrl[:] = m.key_qpos[0][7:] + rng.normal(scale=0.5, size=m.nu)
    mujoco.mj_forward(m, d)
    from tpu_dialmpc.dynamics import smooth

    mine = smooth.actuator_force(
        model,
        jnp.asarray(d.ctrl.copy()),
        jnp.asarray(d.qpos.copy()),
        jnp.asarray(d.qvel.copy()),
    )
    np.testing.assert_allclose(np.asarray(mine), d.qfrc_actuator, atol=1e-10)


@pytest.mark.slow
def test_substepping():
    """n_substeps=8 equals 8 sequential single steps."""
    m = assets.load_mj_model("go2_force")
    model = compile_model(m).with_options(timestep=0.0025)
    qpos = jnp.asarray(m.key_qpos[0])
    st = pipeline.init(model, qpos, jnp.zeros(m.nv))
    ctrl = jnp.asarray(np.linspace(-1, 1, m.nu))
    one = st
    for _ in range(8):
        one = pipeline.step(model, one, ctrl, n_substeps=1)
    eight = pipeline.step(model, st, ctrl, n_substeps=8)
    np.testing.assert_allclose(
        np.asarray(eight.qpos), np.asarray(one.qpos), atol=1e-12
    )


@pytest.mark.slow
def test_step_trajectory_parity_go2_crate():
    """Crate-scene fidelity (VERDICT: quantify the collision approximations).

    collision.py documents two manifold approximations used only by the
    crate scenes: capsule-box emits 2 sphere-box-style contacts (not the
    full edge-clipped manifold) and box-box emits corner contacts only.
    This drives the Go2 into the static crate (base starts ~0.4 m from the
    crate face, forward-biased torques) and measures the PER-STEP model
    error vs the MuJoCo oracle, resyncing our engine to the oracle state
    every step — free-running comparison would conflate the manifold error
    with chaotic divergence."""
    m = assets.load_mj_model("go2_force_crate")
    m.opt.timestep = 0.0025
    model = compile_model(m).with_options(timestep=0.0025)
    d = mujoco.MjData(m)
    qpos = m.key_qpos[0].copy()
    qpos[0] = 0.75  # crate face at x = 1.3 - 0.155; the driven robot reaches it
    d.qpos[:] = qpos
    mujoco.mj_forward(m, d)
    st = pipeline.init(model, jnp.asarray(qpos), jnp.zeros(m.nv))
    step_j = jax.jit(lambda s, c: pipeline.step(model, s, c, n_substeps=1))
    # per-step model error: our engine steps FROM the oracle's exact state
    # every step, so chaotic accumulation through 150 hard-contact steps
    # doesn't mask (or inflate) the manifold approximation error itself
    errs = []
    for k in range(150):
        # forward-driving torques so the robot runs into the crate
        ctrl = np.clip(6.0 * np.sin(0.02 * k + np.arange(12)) + 2.0, -23, 23)
        st = st._replace(
            qpos=jnp.asarray(d.qpos.copy()),
            qvel=jnp.asarray(d.qvel.copy()),
            qacc_warmstart=jnp.asarray(d.qacc_warmstart.copy()),
        )
        d.ctrl[:] = ctrl
        mujoco.mj_step(m, d)
        st = step_j(st, jnp.asarray(ctrl))
        errs.append(float(np.abs(np.asarray(st.qvel) - d.qvel).max()))
    errs = np.array(errs)
    print("go2-crate per-step qvel err: median %.2e p90 %.2e max %.2e" % (
        np.median(errs), np.quantile(errs, 0.9), errs.max()))
    # Recorded distribution (x0=0.75, 150 steps) after the plane-capsule
    # friction-frame fix (collision._plane_capsule): median 2.8e-15,
    # p90 8.7e-15, max 1.1e-3 with 1/150 steps >1e-3 (a near-margin contact
    # activation flip).  Before the fix the generic-tangent friction pyramid
    # put 71/150 steps above 1e-3 (max 0.41).
    assert np.median(errs) < 1e-9, np.median(errs)
    assert (errs > 1e-3).mean() < 0.05, (errs > 1e-3).mean()
    assert errs.max() < 0.05, errs.max()


@pytest.mark.slow
def test_step_trajectory_parity_h1_push_crate():
    """H1 + 30 kg slide-joint crate: box contacts + crate dof parity."""
    m = assets.load_mj_model("h1_push_crate")
    m.opt.timestep = 0.0025
    model = compile_model(m).with_options(timestep=0.0025)
    d = mujoco.MjData(m)
    qpos = m.key_qpos[0].copy() if m.nkey else m.qpos0.copy()
    d.qpos[:] = qpos
    mujoco.mj_forward(m, d)
    st = pipeline.init(model, jnp.asarray(qpos), jnp.zeros(m.nv))
    step_j = jax.jit(lambda s, c: pipeline.step(model, s, c, n_substeps=1))
    errs, crate_errs = [], []
    for k in range(150):
        ctrl = np.clip(8.0 * np.sin(0.02 * k + np.arange(m.nu)), -40, 40)
        st = st._replace(
            qpos=jnp.asarray(d.qpos.copy()),
            qvel=jnp.asarray(d.qvel.copy()),
            qacc_warmstart=jnp.asarray(d.qacc_warmstart.copy()),
        )
        d.ctrl[:] = ctrl
        mujoco.mj_step(m, d)
        st = step_j(st, jnp.asarray(ctrl))
        errs.append(float(np.abs(np.asarray(st.qvel) - d.qvel).max()))
        crate_errs.append(float(abs(float(st.qpos[26]) - d.qpos[26])))
    errs = np.array(errs)
    print("h1-crate per-step qvel err: median %.2e p90 %.2e max %.2e" % (
        np.median(errs), np.quantile(errs, 0.9), errs.max()))
    # The former 15/150-step tail (max 0.18) was root-caused in round 4:
    # _capsule_box emitted the SAME contact twice (segment slot converged to
    # the endpoint slot) for the knee capsule vs the crate, doubling the
    # impulse where MuJoCo emits one contact.  With the duplicate slot
    # deactivated (collision._capsule_box dedupe) the measured distribution
    # is median 2.8e-14, zero steps >1e-3.
    assert np.median(errs) < 1e-9, np.median(errs)
    assert (errs > 1e-3).mean() == 0.0, (errs > 1e-3).mean()
    assert errs.max() < 1e-3, errs.max()
    # the crate's own dof stays within the contact-step envelope
    assert max(crate_errs) < 1e-2, max(crate_errs)
