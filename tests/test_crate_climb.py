"""go2_crate_climb env mechanics (CPU, fast lane).

The task mounts the reference's own obstacle scene
(models/unitree_go2/mjx_scene_force_crate.xml:24-28) with the mocap crate
repositioned so its top face is at a climbable 0.30 m.  These tests pin the
terrain-aware machinery without hardware: box placement, support lookup,
height-target ramp, goal gating, and that the sunk box still carries the
robot (collision works on the repositioned geometry).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_dialmpc.dynamics import pipeline
from tpu_dialmpc.envs import get_env
from tpu_dialmpc.envs.base import EnvState


@pytest.fixture(scope="module")
def env():
    return get_env("go2_crate_climb", n_substeps=8)


def test_box_repositioned_to_climbable_height(env):
    cx, cy, hx, hy, top = env._crate
    assert top == pytest.approx(0.30)
    assert (cx, cy) == (1.3, 0.0)
    # the compiled model's box body sits so the geom top face is at 0.30
    bid = env.model.body_names.index("box_body")
    assert env.model.body_pos[bid][2] == pytest.approx(0.30 - 0.30)


def test_support_z_footprint(env):
    x = jnp.array([0.0, 1.0, 1.3, 1.60, 1.62])
    y = jnp.array([0.0, 0.0, 0.45, 0.0, 0.0])
    got = np.asarray(env._support_z(x, y))
    np.testing.assert_allclose(got, [0.0, 0.3, 0.3, 0.3, 0.0])


def _state_at(env, x, z):
    """A standing state teleported to (x, 0, z)."""
    s = jax.jit(env.reset)(jax.random.PRNGKey(0))
    qpos = s.pipeline.qpos.at[0].set(x).at[2].set(z)
    ps = pipeline.init(env.model, qpos, s.pipeline.qvel)
    return EnvState(
        pipeline=ps, obs=s.obs, reward=s.reward, done=s.done, info=s.info
    )


def test_height_target_rides_the_crate(env):
    """Standing ON the crate (z=0.57) at its center must out-score standing
    at ground height at the same x — the height target has ramped to
    pos_tar_z + 0.30 there."""
    step = jax.jit(env.step)
    a = jnp.zeros(env.action_size)
    r_on = float(step(_state_at(env, 1.3, 0.57), a).reward)
    r_low = float(step(_state_at(env, 1.3, 0.27), a).reward)
    assert r_on > r_low + 0.05, (r_on, r_low)


def test_goal_gating_stops_forward_command(env):
    step = jax.jit(env.step)
    a = jnp.zeros(env.action_size)
    # advance a couple of steps so the ramp is past zero
    s = _state_at(env, 0.0, 0.27)
    s = step(step(s, a), a)
    assert float(s.info.vel_tar[0]) > 0.0  # before the goal: command on
    s_goal = _state_at(env, 1.5, 0.57)
    s_goal = EnvState(
        pipeline=s_goal.pipeline, obs=s_goal.obs, reward=s_goal.reward,
        done=s_goal.done, info=s.info,  # step>0 so the ramp is nonzero
    )
    s2 = step(s_goal, a)
    assert float(s2.info.vel_tar[0]) == 0.0  # past goal_x: command gated


def test_crate_x_parks_the_box_for_travel_tasks():
    """go2_jump uses the crate scene for its collision-capable robot but
    needs flat ground in the travel path: crate_x must move the box body
    down-range and leave terrain-aware rewards off."""
    env = get_env("go2_jump", n_substeps=8)
    bid = env.model.body_names.index("box_body")
    assert env.model.body_pos[bid][0] == pytest.approx(30.0)
    assert env._crate is None  # terrain-aware rewards off
    assert env.config.default_vx == pytest.approx(0.5)


def test_physical_termination_box_allows_climbing_postures(env):
    """The climb task terminates on the PHYSICAL hinge ranges, not the
    locomotion action table (measured: the mounting trajectory spends ~48%
    of steps outside the table while structurally sound).  A front thigh at
    1.6 rad — outside the table's [0.4, 1.4], inside the model's physical
    range — must NOT flag done on the climb env, and MUST flag on a
    default (reference-semantics) env."""
    tjr = env.termination_joint_range
    assert tjr is not None
    # wider than the action table on the thigh rows (indices 1, 4, 7, 10)
    assert all(tjr[i][1] > env.joint_range[i][1] for i in (1, 4, 7, 10))

    # thigh at 2.2 rad: well past the table's 1.4 (one 0.02 s PD step
    # cannot pull it back inside), well inside the physical 3.49
    step = jax.jit(env.step)
    a = jnp.zeros(env.action_size)
    s = _state_at(env, 0.3, 0.27)
    qpos = s.pipeline.qpos.at[7 + 1].set(2.2)
    ps = pipeline.init(env.model, qpos, s.pipeline.qvel)
    s2 = step(
        EnvState(pipeline=ps, obs=s.obs, reward=s.reward, done=s.done,
                 info=s.info),
        a,
    )
    assert not bool(s2.done)

    ref = get_env("go2_stand", n_substeps=8, scene="go2_force_crate")
    s0 = jax.jit(ref.reset)(jax.random.PRNGKey(0))
    qpos_r = s0.pipeline.qpos.at[7 + 1].set(2.2)
    ps_r = pipeline.init(ref.model, qpos_r, s0.pipeline.qvel)
    s2_r = jax.jit(ref.step)(
        EnvState(pipeline=ps_r, obs=s0.obs, reward=s0.reward,
                 done=s0.done, info=s0.info),
        a,
    )
    assert bool(s2_r.done)


def test_crate_carries_the_robot(env):
    """Drop the robot onto the crate top: contacts with the repositioned
    box must hold it (no fall-through to the floor)."""
    step = jax.jit(env.step)
    a = jnp.zeros(env.action_size)
    s = _state_at(env, 1.3, 0.58)
    for _ in range(12):
        s = step(s, a)
    z = float(s.pipeline.qpos[2])
    assert z > 0.42, f"torso sank to {z:.3f} — box contacts not resolving"
