"""Planner (MBDPI) math tests against a numpy transcription of the reference,
using a cheap mock environment so no physics is involved.

Mock env: state x (nu,), dynamics x' = 0.9 x + 0.1 u, reward -|x - 1|².
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from tpu_dialmpc.core import spline
from tpu_dialmpc.planner.dial import DialConfig, MBDPI


class MockState(NamedTuple):
    x: jnp.ndarray
    reward: jnp.ndarray
    done: jnp.ndarray


class MockEnv:
    def __init__(self, nu=3):
        self.nu = nu

    @property
    def action_size(self):
        return self.nu

    def step(self, state: MockState, u: jnp.ndarray) -> MockState:
        x = 0.9 * state.x + 0.1 * u
        reward = -jnp.sum((x - 1.0) ** 2)
        return MockState(x=x, reward=reward, done=jnp.asarray(False))


def _mock_reset(nu=3):
    return MockState(
        x=jnp.zeros(nu), reward=jnp.asarray(0.0), done=jnp.asarray(False)
    )


def _numpy_reverse_once(cfg, nu, x0, Ybar, noise, noise_scale):
    """Direct numpy transcription of dial-core.h:469-593 on the mock env."""
    n2u = spline.node2u_matrix(cfg.Hnode, cfg.Hsample, cfg.ctrl_dt)
    cands = Ybar[None] + noise * noise_scale[None, :, None]
    cands[:, 0, :] = Ybar[0]
    all_y = np.concatenate([cands, Ybar[None]], 0)
    all_y = np.clip(all_y, -1, 1)
    us = np.einsum("qn,snu->squ", n2u, all_y)
    # rollout
    T = cfg.Hsample + 1
    rews = np.zeros((all_y.shape[0], T))
    for s in range(all_y.shape[0]):
        x = x0.copy()
        for t in range(T):
            x = 0.9 * x + 0.1 * us[s, t]
            rews[s, t] = -np.sum((x - 1.0) ** 2)
    mean = rews.mean(-1)
    rew_ybar = rews[-1].mean()
    var = ((rews - mean[:, None]) ** 2).mean(-1)
    std = np.where(var > 1e-14, np.sqrt(var), 1e-7)
    logp0 = (mean - rew_ybar) / (std * cfg.temp_sample)
    w = np.exp(logp0 - logp0.max())
    w /= w.sum()
    return np.einsum("s,snu->nu", w, all_y), w


def test_reverse_once_matches_numpy_reference():
    # the numpy transcription implements the C++ time-std scoring (quirk Q9)
    cfg = DialConfig(Hsample=8, Hnode=3, Nsample=16, ctrl_dt=0.02, score_std="time")
    env = MockEnv()
    mbdpi = MBDPI(cfg, env)
    rng = np.random.default_rng(0)
    Ybar = rng.uniform(-0.5, 0.5, (cfg.Hnode + 1, env.nu))
    noise = rng.standard_normal((cfg.Nsample, cfg.Hnode + 1, env.nu))
    scale = np.full(cfg.Hnode + 1, 0.3)
    state = _mock_reset()

    got, _ = mbdpi.reverse_once(
        state,
        jax.random.PRNGKey(0),
        jnp.asarray(Ybar),
        jnp.asarray(scale),
        noise=jnp.asarray(noise),
    )
    want, w = _numpy_reverse_once(cfg, env.nu, np.zeros(env.nu), Ybar, noise, scale)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-10)


def test_first_node_pinned():
    """Ybar[0] must equal clip(Ybar_i[0]) — every candidate shares it
    (dial-core.h:493) and softmax weights sum to 1."""
    cfg = DialConfig(Hsample=8, Hnode=3, Nsample=32, ctrl_dt=0.02)
    env = MockEnv()
    mbdpi = MBDPI(cfg, env)
    Ybar = jnp.asarray(np.random.default_rng(1).uniform(-2, 2, (4, 3)))
    out, info = mbdpi.reverse_once(
        _mock_reset(), jax.random.PRNGKey(1), Ybar, jnp.full(4, 0.2)
    )
    np.testing.assert_allclose(
        np.asarray(out[0]), np.clip(np.asarray(Ybar[0]), -1, 1), atol=1e-12
    )
    np.testing.assert_allclose(float(jnp.sum(info.weights)), 1.0, atol=1e-9)


def test_shift_constant_trajectory():
    """Shifting a constant trajectory stays constant except the zero-filled tail."""
    cfg = DialConfig(Hsample=16, Hnode=4, ctrl_dt=0.02)
    mbdpi = MBDPI(cfg, MockEnv())
    Y = jnp.ones((cfg.Hnode + 1, 3)) * 0.7
    Y2 = np.asarray(mbdpi.shift(Y))
    np.testing.assert_allclose(Y2[:-1], 0.7, atol=0.15)
    assert abs(Y2[-1].mean()) < 0.7  # tail pulled toward the zero fill


def test_improve_reduces_tracking_error():
    """On the mock env, annealed iterations should improve the objective."""
    cfg = DialConfig(
        Hsample=10,
        Hnode=4,
        Nsample=64,
        Ndiffuse=2,
        temp_sample=0.1,
        horizon_diffuse_factor=0.9,
        traj_diffuse_factor=0.5,
        ctrl_dt=0.02,
    )
    env = MockEnv()
    mbdpi = MBDPI(cfg, env)
    state = _mock_reset()
    Y = jnp.zeros((cfg.Hnode + 1, env.nu))

    def score(Y):
        rews, _ = mbdpi.rollout_us(state, mbdpi.node2u(Y))
        return float(rews.mean())

    before = score(Y)
    Y2, _ = mbdpi.improve(state, Y, jax.random.PRNGKey(2), 4)
    after = score(Y2)
    assert after > before


def test_reverse_warmstart_runs():
    cfg = DialConfig(Hsample=8, Hnode=3, Nsample=8, Ndiffuse=3, ctrl_dt=0.02)
    mbdpi = MBDPI(cfg, MockEnv())
    Y = mbdpi.reverse(_mock_reset(), jnp.zeros((4, 3)), jax.random.PRNGKey(3))
    assert Y.shape == (4, 3)
    assert bool(jnp.all(jnp.isfinite(Y)))
