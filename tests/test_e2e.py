"""End-to-end smoke tests: envs + planner on real physics (small shapes)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_dialmpc.envs import get_env
from tpu_dialmpc.planner.dial import DialConfig, MBDPI


@pytest.mark.slow
def test_go2_env_reset_step():
    env = get_env("go2_stand", n_substeps=1)
    state = env.reset(jax.random.PRNGKey(0))
    assert state.pipeline.qpos.shape == (19,)
    assert abs(float(state.pipeline.qpos[2]) - 0.27) < 1e-6
    s2 = jax.jit(env.step)(state, jnp.zeros(env.action_size))
    assert np.isfinite(float(s2.reward))
    assert not bool(s2.done)
    assert int(s2.info.step) == 1
    assert s2.obs.shape == (env.observation_size,)


@pytest.mark.slow
def test_go2_env_stands_under_home_pd():
    """PD-holding the home pose keeps the robot upright (sanity of physics+env)."""
    env = get_env("go2_stand", n_substeps=8)
    state = env.reset(jax.random.PRNGKey(0))
    # action that maps to the home pose under act2joint
    jr = env.joint_range
    home = np.asarray(env._default_pose)
    act = (home - jr[:, 0]) / (jr[:, 1] - jr[:, 0]) * 2.0 - 1.0
    act = jnp.asarray(act)
    step = jax.jit(env.step)
    for _ in range(25):  # 0.5 s
        state = step(state, act)
    assert not bool(state.done)
    # kp=30 PD sags a little under gravity; stays above the 0.18 fall threshold
    assert float(state.pipeline.qpos[2]) > 0.18


@pytest.mark.slow
def test_h1_env_reset_step():
    env = get_env("h1_walk", n_substeps=1)
    state = env.reset(jax.random.PRNGKey(0))
    s2 = jax.jit(env.step)(state, jnp.zeros(env.action_size))
    assert np.isfinite(float(s2.reward))


@pytest.mark.slow
def test_dial_mpc_tiny_loop():
    """Three receding-horizon control steps on real Go2 physics."""
    from tpu_dialmpc.planner import runner

    env = get_env("go2_stand", n_substeps=1)
    cfg = DialConfig(
        Hsample=4,
        Hnode=2,
        Nsample=8,
        Ndiffuse=1,
        Ndiffuse_init=2,
        n_steps=3,
        ctrl_dt=0.02,
    )
    res = runner.run(env, cfg)
    assert res.rewards.shape == (3,)
    assert np.all(np.isfinite(np.asarray(res.rewards)))
    assert res.us.shape == (3, env.action_size)


@pytest.mark.slow
def test_graft_entry():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert np.isfinite(float(out.reward))


@pytest.mark.slow
def test_run_scan_matches_host_loop():
    """run_scan (one on-device lax.scan) equals the host-loop driver."""
    import numpy as np

    from tpu_dialmpc.envs import get_env
    from tpu_dialmpc.planner import runner
    from tpu_dialmpc.planner.dial import DialConfig

    env = get_env("go2_stand", n_substeps=1)
    cfg = DialConfig(
        Hsample=4, Hnode=2, Nsample=4, Ndiffuse=1, Ndiffuse_init=1, n_steps=4
    )
    a = runner.run(env, cfg)
    b = runner.run_scan(env, cfg)
    np.testing.assert_allclose(
        np.asarray(a.qpos), np.asarray(b.qpos), atol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(a.rewards), np.asarray(b.rewards), atol=1e-10
    )
