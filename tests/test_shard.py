"""Sharded planner equality: 8-device CPU mesh vs single device."""

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_dialmpc.planner.dial import DialConfig, MBDPI
from tpu_dialmpc.shard import ShardedMBDPI, make_mesh


class MockState(NamedTuple):
    x: jnp.ndarray
    reward: jnp.ndarray
    done: jnp.ndarray


class MockEnv:
    def __init__(self, nu=4):
        self.nu = nu

    @property
    def action_size(self):
        return self.nu

    def step(self, state, u):
        x = 0.9 * state.x + 0.1 * u
        return MockState(x=x, reward=-jnp.sum((x - 1.0) ** 2), done=jnp.asarray(False))


def _reset(nu=4):
    return MockState(x=jnp.zeros(nu), reward=jnp.asarray(0.0), done=jnp.asarray(False))


def test_eight_devices_available():
    assert len(jax.devices()) == 8


@pytest.mark.parametrize("nsample", [64, 256])
def test_sharded_reverse_once_matches_single_device(nsample):
    cfg = DialConfig(Hsample=8, Hnode=3, Nsample=nsample, ctrl_dt=0.02)
    env = MockEnv()
    single = MBDPI(cfg, env)
    mesh = make_mesh()
    sharded = ShardedMBDPI(cfg, env, mesh)
    state = _reset()
    Ybar = jnp.asarray(
        np.random.default_rng(0).uniform(-0.5, 0.5, (cfg.Hnode + 1, env.nu))
    )
    scale = jnp.full(cfg.Hnode + 1, 0.3)
    key = jax.random.PRNGKey(7)

    y1, i1 = jax.jit(single.reverse_once)(state, key, Ybar, scale)
    y2, i2 = jax.jit(sharded.reverse_once)(state, key, Ybar, scale)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-12)
    np.testing.assert_allclose(np.asarray(i1.rews), np.asarray(i2.rews), atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(i1.weights), np.asarray(i2.weights), atol=1e-12
    )


def test_sharded_noise_deterministic_across_mesh_shapes():
    """Same key ⇒ identical candidates on 1, 2, 4, 8-device meshes."""
    cfg = DialConfig(Hsample=6, Hnode=2, Nsample=64, ctrl_dt=0.02)
    env = MockEnv()
    state = _reset()
    Ybar = jnp.zeros((cfg.Hnode + 1, env.nu))
    scale = jnp.full(cfg.Hnode + 1, 0.5)
    key = jax.random.PRNGKey(3)
    outs = []
    for nd in (1, 2, 4, 8):
        mesh = make_mesh(n_devices=nd)
        mb = ShardedMBDPI(cfg, env, mesh)
        y, _ = jax.jit(mb.reverse_once)(state, key, Ybar, scale)
        outs.append(np.asarray(y))
    for o in outs[1:]:
        np.testing.assert_allclose(o, outs[0], atol=1e-12)


def test_sharded_improve_chain():
    cfg = DialConfig(
        Hsample=8, Hnode=3, Nsample=128, Ndiffuse=2, ctrl_dt=0.02,
        horizon_diffuse_factor=0.9,
    )
    env = MockEnv()
    mesh = make_mesh()
    mb = ShardedMBDPI(cfg, env, mesh)
    y, infos = jax.jit(lambda s, y, k: mb.improve(s, y, k, 3))(
        _reset(), jnp.zeros((cfg.Hnode + 1, env.nu)), jax.random.PRNGKey(0)
    )
    assert y.shape == (cfg.Hnode + 1, env.nu)
    assert np.all(np.isfinite(np.asarray(y)))
    assert infos.rews.shape == (3, cfg.Nsample + 1)
