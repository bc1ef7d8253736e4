"""Gait reference and action-map unit tests (SURVEY §4 test plan: C7 gait
function and C10c act2joint/act2tau golden vectors)."""

import jax.numpy as jnp
import numpy as np

from tpu_dialmpc.envs import gait, get_env


def _step_height_np(t, footphase, duty_ratio):
    """Direct numpy port of the C++ step_height (unitree-go2-env.h:105-135)."""
    angle = np.mod(t + np.pi - footphase, 2 * np.pi) - np.pi
    if duty_ratio < 1.0:
        angle = angle * 0.5 / (1.0 - duty_ratio)
    clipped = np.clip(angle, -np.pi / 2, np.pi / 2)
    value = np.cos(clipped) if duty_ratio < 1.0 else 0.0
    return abs(value) if abs(value) >= 1e-6 else 0.0


def test_step_height_matches_reference_port():
    rng = np.random.default_rng(0)
    for _ in range(50):
        t = rng.uniform(0, 20)
        fp = rng.uniform(0, 2 * np.pi)
        duty = rng.choice([0.3, 0.45, 0.75, 1.0])
        got = float(gait.step_height(jnp.asarray(t), jnp.asarray(fp), duty))
        want = _step_height_np(t, fp, duty)
        np.testing.assert_allclose(got, want, atol=1e-6)


def test_get_foot_step_stand_is_zero():
    duty, cadence, amplitude = gait.GAIT_PARAMS["stand"]
    phases = jnp.asarray(gait.GAIT_PHASES["stand"])
    for t in (0.0, 0.1, 1.7):
        h = gait.get_foot_step(duty, cadence, amplitude, phases, t)
        np.testing.assert_allclose(np.asarray(h), 0.0, atol=1e-12)


def test_get_foot_step_trot_alternates():
    """Trot: diagonal pairs (FL,RR) vs (FR,RL) swing in antiphase."""
    duty, cadence, amplitude = gait.GAIT_PARAMS["trot"]
    phases = jnp.asarray(gait.GAIT_PHASES["trot"])  # (0, .5, .5, 0)
    ts = np.linspace(0, 1.0 / cadence, 40, endpoint=False)
    hs = np.stack(
        [np.asarray(gait.get_foot_step(duty, cadence, amplitude, phases, t)) for t in ts]
    )
    assert hs.max() <= amplitude + 1e-7
    np.testing.assert_allclose(hs[:, 0], hs[:, 3], atol=1e-7)  # FL == RR phase
    np.testing.assert_allclose(hs[:, 1], hs[:, 2], atol=1e-7)  # FR == RL phase
    # antiphase: when one pair is at peak swing the other is in stance (0)
    peak = int(hs[:, 0].argmax())
    assert hs[peak, 1] < 1e-6


def test_act2joint_model_mode_golden():
    """act -1/0/+1 map to lo/mid/hi of the joint range (unitree-go2-env.h:671-696)."""
    env = get_env("go2_stand", joint_range_source="model")
    jr = env.joint_range
    lo = np.asarray(env.act2joint(jnp.full(12, -1.0)))
    mid = np.asarray(env.act2joint(jnp.zeros(12)))
    hi = np.asarray(env.act2joint(jnp.full(12, 1.0)))
    np.testing.assert_allclose(lo, jr[:, 0], atol=1e-6)
    np.testing.assert_allclose(mid, jr.mean(axis=1), atol=1e-6)
    np.testing.assert_allclose(hi, jr[:, 1], atol=1e-6)


def test_act2joint_upstream_zero_is_home():
    """Upstream ranges: act=0 targets (approximately) the home pose for the
    legs whose table interval is home-centered."""
    env = get_env("go2_stand")  # default joint_range_source="upstream"
    mid = np.asarray(env.act2joint(jnp.zeros(12)))
    home = env._init_q[7:19]
    # hips exactly 0; thighs 0.9; calf table midpoints are near home
    np.testing.assert_allclose(mid[0::3], home[0::3], atol=1e-6)
    np.testing.assert_allclose(mid[1::3], home[1::3], atol=1e-6)
    assert np.all(np.abs(mid[2::3] - home[2::3]) < 0.25)


def test_act2tau_pd_golden():
    """tau = kp (target - q) - kd qdot, clipped to the torque range."""
    import jax

    env = get_env("go2_stand", joint_range_source="model", kp=30.0, kd=0.65)
    state = env.reset(jax.random.PRNGKey(0))
    act = jnp.full(12, 0.25)
    tau = np.asarray(env.act2tau(act, state.pipeline))
    q = np.asarray(state.pipeline.qpos[7:19])
    qd = np.asarray(state.pipeline.qvel[6:18])
    target = np.asarray(env.act2joint(act))
    want = np.clip(
        30.0 * (target - q) - 0.65 * qd,
        env.joint_torque_range[:, 0],
        env.joint_torque_range[:, 1],
    )
    np.testing.assert_allclose(tau, want, atol=1e-5)
    # saturation: a huge action must clip to the torque limit
    tau_sat = np.asarray(env.act2tau(jnp.full(12, 1.0) * 1.0, state.pipeline))
    assert np.all(tau_sat <= env.joint_torque_range[:, 1] + 1e-6)


def test_sample_command_bounds_and_structure():
    """C10e (unitree-go2-env.h:740-753): uniform resample of
    (vx ±1.5, vy ±0.5, vyaw ±1.5); vz and roll/pitch rates stay zero."""
    import jax

    env = get_env("go2_stand")
    vels, angs = [], []
    for s in range(50):
        v, a = env.sample_command(jax.random.PRNGKey(s))
        v, a = np.asarray(v), np.asarray(a)
        assert v[2] == 0.0 and a[0] == 0.0 and a[1] == 0.0
        vels.append(v)
        angs.append(a)
    vels, angs = np.stack(vels), np.stack(angs)
    assert np.all(np.abs(vels[:, 0]) <= 1.5) and np.all(np.abs(vels[:, 1]) <= 0.5)
    assert np.all(np.abs(angs[:, 2]) <= 1.5)
    # actually spans the range (not degenerate)
    assert vels[:, 0].max() > 0.75 and vels[:, 0].min() < -0.75


def test_turn_schedule_sign_flip_and_integrated_yaw_target():
    """go2_turn command schedule (envs/go2.py turn_period): the commanded
    yaw rate is a ramped square wave flipping sign every turn_period steps,
    and yaw_tar integrates the commanded rate (carried in info) instead of
    the C++ constant-command closed form."""
    import jax
    import jax.numpy as jnp

    env = get_env(
        "go2_turn", n_substeps=1, turn_period=3, ramp_up_time=1e-9
    )
    state = env.reset(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    vyaws, yaw_tars = [], []
    for _ in range(9):
        state = step(state, jnp.zeros(env.action_size))
        vyaws.append(float(state.info.ang_vel_tar[2]))
        yaw_tars.append(float(state.info.yaw_tar))
    vyaws = np.asarray(vyaws)
    # step 0 rides the ramp from zero (frac = step·dt/T = 0, exactly like
    # the C++ vx ramp at t=0); then +1.5 until the first flip at step 3
    np.testing.assert_allclose(vyaws[0], 0.0, atol=1e-6)
    np.testing.assert_allclose(vyaws[1:3], 1.5, atol=1e-6)
    np.testing.assert_allclose(vyaws[3:6], -1.5, atol=1e-6)
    np.testing.assert_allclose(vyaws[6:9], 1.5, atol=1e-6)
    # yaw_tar integrates vyaw*dt step by step
    np.testing.assert_allclose(
        yaw_tars, np.cumsum(vyaws * env.dt), atol=1e-5
    )


def test_termination_breakdown_per_cause():
    """Each of the three done predicates (unitree-go2-env.h:561-589) is
    attributed to the right cause, and the recomputed OR matches what the
    env's own _post_physics would flag for the same qpos rows."""
    from tpu_dialmpc.quality import termination_breakdown

    env = get_env("go2_stand")
    home = np.asarray(env._init_q)

    ok = home.copy()                       # healthy standing pose
    low = home.copy()
    low[2] = 0.17                          # below the 0.18 floor
    inv = home.copy()
    inv[3:7] = [0.0, 1.0, 0.0, 0.0]        # 180-degree roll: upside down
    oor = home.copy()
    oor[8] = env.joint_range[1, 1] + 0.05  # FR thigh past its range

    qpos = np.stack([ok, low, ok, inv, ok, oor, oor, ok])
    b = termination_breakdown(env, qpos)
    n = len(qpos)
    assert b["dones_height_mean"] == 1 / n
    assert b["dones_inverted_mean"] == 1 / n
    assert b["dones_joint_mean"] == 2 / n
    assert b["dones_recomputed_mean"] == 4 / n
    assert b["done_run_max"] == 2.0        # the two consecutive oor rows
    assert b["joint_graze_rates"][1] == round(2 / n, 4)
    assert sum(b["joint_graze_rates"]) == b["joint_graze_rates"][1]


def test_termination_breakdown_matches_env_done():
    """The recomputed OR equals the env step's done flag on real dynamics
    (drop from above so the trajectory crosses the height floor)."""
    import jax

    from tpu_dialmpc.quality import termination_breakdown

    env = get_env("go2_stand", n_substeps=8)
    state = env.reset(jax.random.PRNGKey(0))
    # start a bit low so passive sinking trips z < 0.18 within the horizon
    qpos = state.pipeline.qpos.at[2].set(0.21)
    state = state._replace(pipeline=state.pipeline._replace(qpos=qpos))
    step = jax.jit(env.step)
    qs, dones = [], []
    for _ in range(25):
        state = step(state, jnp.full(env.action_size, -0.3))
        qs.append(np.asarray(state.pipeline.qpos))
        dones.append(bool(state.done))
    b = termination_breakdown(env, np.stack(qs))
    assert any(dones), "probe never terminated; thresholds unexercised"
    assert b["dones_recomputed_mean"] == np.mean(dones)


def test_done_penalty_prices_termination():
    """done_penalty subtracts exactly its value on flagged steps and is a
    no-op on healthy ones (and at the default 0.0 = reference semantics)."""
    import jax

    base = get_env("go2_stand", n_substeps=1)
    pen = get_env("go2_stand", n_substeps=1, done_penalty=2.5)

    s0 = base.reset(jax.random.PRNGKey(0))
    # healthy pose: no flag, identical reward
    a = jnp.zeros(base.action_size)
    r0 = float(base.step(s0, a).reward)
    r1 = float(pen.step(s0, a).reward)
    assert r0 == r1

    # force a flagged state: FR thigh past its range
    bad_q = s0.pipeline.qpos.at[8].set(float(base.joint_range[1, 1]) + 0.2)
    s_bad = s0._replace(pipeline=s0.pipeline._replace(qpos=bad_q))
    st_b = base.step(s_bad, a)
    st_p = pen.step(s_bad, a)
    assert bool(st_b.done) and bool(st_p.done)
    np.testing.assert_allclose(
        float(st_p.reward), float(st_b.reward) - 2.5, atol=1e-5
    )


def test_pronk_gait_all_feet_in_phase():
    """Pronk: all four foot targets identical at every t and reaching the
    commanded amplitude — the lift-off demand a torso can only satisfy
    ballistically (go2_jump)."""
    duty, cadence, amplitude = gait.GAIT_PARAMS["pronk"]
    phases = jnp.asarray(gait.GAIT_PHASES["pronk"])
    ts = np.linspace(0, 2.0 / cadence, 60, endpoint=False)
    hs = np.stack(
        [np.asarray(gait.get_foot_step(duty, cadence, amplitude, phases, t))
         for t in ts]
    )
    for j in range(1, 4):
        np.testing.assert_allclose(hs[:, 0], hs[:, j], atol=1e-7)
    assert abs(hs.max() - amplitude) < 1e-6
    assert (hs[:, 0] < 1e-6).mean() > 0.25  # a real stance window exists


def test_go2_jump_registered_with_flight_gate():
    from tpu_dialmpc.envs.registry import list_envs
    from tpu_dialmpc.quality import GATES

    assert "go2_jump" in list_envs()
    env = get_env("go2_jump", n_substeps=8)
    assert env.config.gait == "pronk" and env.config.done_penalty > 0
    checks = {c[0] for c in GATES["go2_jump"].checks}
    assert {"flight_run_max", "n_flights"} <= checks
