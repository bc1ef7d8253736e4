"""Checkpoint/resume roundtrip (tpu_dialmpc/checkpoint.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_dialmpc import checkpoint
from tpu_dialmpc.envs import get_env
from tpu_dialmpc.planner.dial import DialConfig


@pytest.mark.slow
def test_checkpoint_roundtrip(tmp_path):
    env = get_env("go2_stand", n_substeps=1)
    cfg = DialConfig(Hsample=5, Hnode=2, Nsample=4, n_steps=7)
    state = env.reset(jax.random.PRNGKey(0))
    state = env.step(state, jnp.zeros(env.action_size))
    Y0 = jnp.linspace(-0.5, 0.5, (cfg.Hnode + 1) * env.action_size).reshape(
        cfg.Hnode + 1, env.action_size
    )
    key = jax.random.PRNGKey(42)
    path = str(tmp_path / "ck.npz")
    checkpoint.save(path, state, Y0, key, cfg, step=3)

    state2, Y0b, key2, cfg2, step = checkpoint.load(path, env)
    assert step == 3
    assert cfg2 == cfg
    np.testing.assert_array_equal(np.asarray(Y0b), np.asarray(Y0))
    np.testing.assert_array_equal(
        np.asarray(jax.random.key_data(key2) if jnp.issubdtype(key2.dtype, jax.dtypes.prng_key) else key2),
        np.asarray(jax.random.key_data(key) if jnp.issubdtype(key.dtype, jax.dtypes.prng_key) else key),
    )
    np.testing.assert_allclose(
        np.asarray(state2.pipeline.qpos), np.asarray(state.pipeline.qpos)
    )
    np.testing.assert_allclose(
        np.asarray(state2.pipeline.qvel), np.asarray(state.pipeline.qvel)
    )
    np.testing.assert_array_equal(
        np.asarray(state2.pipeline.qacc_warmstart),
        np.asarray(state.pipeline.qacc_warmstart),
    )
    np.testing.assert_allclose(
        np.asarray(state2.info.vel_tar), np.asarray(state.info.vel_tar)
    )
    assert int(state2.info.step) == int(state.info.step)
    # the restored state must step identically to the original
    s_a = env.step(state, jnp.full(env.action_size, 0.1))
    s_b = env.step(state2, jnp.full(env.action_size, 0.1))
    np.testing.assert_allclose(
        np.asarray(s_a.pipeline.qpos), np.asarray(s_b.pipeline.qpos), atol=1e-12
    )
