"""H1 push-crate reward-shaping unit tests (envs/h1.py leash + crate term).

Both exercise `_post_physics` directly — it is a pure function of
(pipeline-derived quantities, info), so the anchor/crate logic can be pinned
without stepping physics (the XLA-CPU compile of a full H1 contact step is
~100 s; these compile in seconds)."""

import jax
import jax.numpy as jnp
import numpy as np

from tpu_dialmpc.envs import get_env


def _post_args(env, state):
    ps = state.pipeline
    b = env._torso_idx
    return dict(
        qpos=ps.qpos,
        qvel=ps.qvel,
        site_xpos=ps.site_xpos,
        torso_xpos=ps.xpos[b],
        torso_xquat=ps.xquat[b],
        torso_cvel=ps.cvel[b],
        root_com=ps.subtree_com[int(env.model.body_rootid[b])],
        qfrc_actuator=ps.qfrc_actuator,
        ctrl=jnp.zeros(env.action_size),
    )


def test_h1_pos_anchor_leash():
    """With a leash, pos_tar never leads the torso xy by more than the leash.

    The anchor integrates vel_tar open-loop; h1_push_crate caps real progress
    (30 kg crate), so an unleashed target runs away and its penalty dominates
    the reward until the planner trades balance for lunging (envs/h1.py
    pos_anchor_leash).  Iterate the info update with the robot frozen in
    place (the worst case: zero real progress while the target marches at
    default_vx) and check the invariant at every step.
    """
    env = get_env("h1_push_crate", fused="off", n_substeps=8)  # dt=0.02
    leash = env.config.pos_anchor_leash
    assert leash > 0.0
    state = env.reset(jax.random.PRNGKey(0))
    args = _post_args(env, state)

    def body(info, _):
        _, _, info2 = env._post_physics(info=info, **args)
        return info2, info2.pos_tar

    # 400 control steps = 8 s; vx=0.3 with a 1 s ramp integrates ~2.25 m
    _, pos_tars = jax.jit(
        lambda info: jax.lax.scan(body, info, None, length=400)
    )(state.info)
    torso_xy = np.asarray(args["torso_xpos"][:2])
    leads = np.linalg.norm(np.asarray(pos_tars)[:, :2] - torso_xy, axis=-1)
    assert leads.max() <= leash + 1e-5, leads.max()
    # the cap must actually be active by the end
    assert leads[-1] > 0.95 * leash, leads[-1]


def test_h1_crate_velocity_reward_capped():
    """The crate term rewards crate velocity, clipped at ±crate_vel_cap.

    Evaluate `_post_physics` on states differing only in the crate dof's
    velocity: the reward difference must be exactly weight·clip(v, ±cap) —
    linear below the cap (pushing is rewarded), flat above it (a dive-shove
    velocity spike earns nothing extra)."""
    env = get_env("h1_push_crate", fused="off", n_substeps=8)
    w, cap = env.config.crate_vel_weight, env.config.crate_vel_cap
    assert w > 0.0 and env._crate_dof is not None
    state = env.reset(jax.random.PRNGKey(0))
    args = _post_args(env, state)

    @jax.jit
    def reward_with_crate_v(v):
        a = dict(args)
        a["qvel"] = a["qvel"].at[env._crate_dof].set(v)
        r, _, _ = env._post_physics(info=state.info, **a)
        return r

    r0 = float(reward_with_crate_v(0.0))
    for v in (0.1, -0.1, cap, 2 * cap, 8 * cap, -3 * cap):
        got = float(reward_with_crate_v(v)) - r0
        want = w * float(np.clip(v, -cap, cap))
        np.testing.assert_allclose(got, want, atol=1e-5, err_msg=str(v))


def test_h1_crate_anchor_mode():
    """pos_anchor_mode="crate": the target tracks the crate minus standoff.

    Walking past the crate is then penalized (the target stays at the
    crate), and the target advances exactly as fast as the crate is
    pushed."""
    env = get_env(
        "h1_push_crate",
        fused="off",
        n_substeps=8,
        pos_anchor_mode="crate",
        pos_anchor_leash=0.0,
    )
    assert env._crate_qadr is not None
    state = env.reset(jax.random.PRNGKey(0))
    args = _post_args(env, state)
    standoff = env.config.crate_standoff

    @jax.jit
    def target_for_crate_x(x):
        a = dict(args)
        a["qpos"] = a["qpos"].at[env._crate_qadr].set(x)
        _, _, info2 = env._post_physics(info=state.info, **a)
        return info2.pos_tar

    for cx in (1.0, 1.5, 2.3):
        tar = np.asarray(target_for_crate_x(cx))
        np.testing.assert_allclose(tar[0], cx - standoff, atol=1e-6)
        np.testing.assert_allclose(tar[1], 0.0, atol=1e-6)
    # height target untouched
    np.testing.assert_allclose(
        np.asarray(target_for_crate_x(1.0))[2], env.config.pos_tar_z, atol=1e-6
    )


def test_h1_crate_anchor_fallback_honors_leash():
    """pos_anchor_mode="crate" on a crate-free scene falls back to the
    open-loop integrator — and a configured leash must then apply.

    Regression: the leash used to gate on the configured mode STRING, so
    the fallback branch ran unleashed (the exact runaway-target case the
    leash exists to bound)."""
    env = get_env(
        "h1_walk",
        fused="off",
        n_substeps=8,
        pos_anchor_mode="crate",
        pos_anchor_leash=0.4,
    )
    assert env._crate_qadr is None  # no crate dof: the fallback branch runs
    state = env.reset(jax.random.PRNGKey(0))
    args = _post_args(env, state)

    def body(info, _):
        _, _, info2 = env._post_physics(info=info, **args)
        return info2, info2.pos_tar

    _, pos_tars = jax.jit(
        lambda info: jax.lax.scan(body, info, None, length=400)
    )(state.info)
    torso_xy = np.asarray(args["torso_xpos"][:2])
    leads = np.linalg.norm(np.asarray(pos_tars)[:, :2] - torso_xy, axis=-1)
    assert leads.max() <= 0.4 + 1e-5, leads.max()


def test_h1_sample_command_bounds_and_structure():
    """H1 command resample bounds (envs/h1.py:sample_command): uniform
    (vx ±1.0, vy ±0.5, vyaw ±1.0); vz and roll/pitch rates stay zero."""
    env = get_env("h1_walk")
    vels, angs = [], []
    for s in range(50):
        v, a = env.sample_command(jax.random.PRNGKey(s))
        v, a = np.asarray(v), np.asarray(a)
        assert v[2] == 0.0 and a[0] == 0.0 and a[1] == 0.0
        vels.append(v)
        angs.append(a)
    vels, angs = np.stack(vels), np.stack(angs)
    assert np.all(np.abs(vels[:, 0]) <= 1.0) and np.all(np.abs(vels[:, 1]) <= 0.5)
    assert np.all(np.abs(angs[:, 2]) <= 1.0)
    assert vels[:, 0].max() > 0.5 and vels[:, 0].min() < -0.5


def test_h1_observation_size_matches_obs():
    """observation_size (new in round 3 — Go2 parity) matches the actual
    observation vector produced by reset."""
    env = get_env("h1_walk")
    state = env.reset(jax.random.PRNGKey(0))
    assert state.obs.shape == (env.observation_size,)


def test_termination_breakdown_h1_dispatch():
    """H1 branch: physical ranges with the 0.05 rad soft-limit margin and
    the 0.5 m pelvis floor (envs/h1.py termination block)."""
    import numpy as np

    from tpu_dialmpc.quality import termination_breakdown

    env = get_env("h1_walk")
    home = np.asarray(env._init_q, dtype=float)
    ok = home.copy()
    low = home.copy()
    low[2] = 0.49
    graze = home.copy()  # inside the margin: NOT a termination
    qadr = np.asarray(env._act_qadr)
    graze[qadr[0]] = env.physical_joint_range[0, 1] + 0.03
    oor = home.copy()
    oor[qadr[0]] = env.physical_joint_range[0, 1] + 0.07

    b = termination_breakdown(env, np.stack([ok, low, graze, oor]))
    assert b["dones_height_mean"] == 0.25
    assert b["dones_joint_mean"] == 0.25
    assert b["dones_inverted_mean"] == 0.0
    assert b["dones_recomputed_mean"] == 0.5


def test_h1_done_penalty_prices_termination():
    """H1 done_penalty (added after the capsule-box dedup fix exposed
    dive-shoving on h1_push_crate): subtracts exactly its value on flagged
    steps, no-op on healthy ones, default 0.0 elsewhere — and the crate
    task carries it (registry)."""
    base = get_env("h1_walk", fused="off", n_substeps=1)
    pen = get_env("h1_walk", fused="off", n_substeps=1, done_penalty=2.0)
    assert get_env("h1_push_crate", fused="off").config.done_penalty > 0
    assert base.config.done_penalty == 0.0

    s0 = base.reset(jax.random.PRNGKey(0))
    a = jnp.zeros(base.action_size)
    r0 = float(base.step(s0, a).reward)
    r1 = float(pen.step(s0, a).reward)
    assert r0 == r1  # healthy: no flag, identical reward

    # flagged state: pelvis below the 0.5 m floor
    bad_q = s0.pipeline.qpos.at[2].set(0.45)
    s_bad = s0._replace(pipeline=s0.pipeline._replace(qpos=bad_q))
    st_b = base.step(s_bad, a)
    st_p = pen.step(s_bad, a)
    assert bool(st_b.done) and bool(st_p.done)
    np.testing.assert_allclose(
        float(st_p.reward), float(st_b.reward) - 2.0, atol=1e-5
    )
