"""Sharded planner equality with REAL Go2 physics (not MockEnv).

Cross-mesh-shape equality at a non-toy config: the full reverse_once —
noise, spline expansion, 64 constrained-contact physics rollouts, collective
softmax update — produces the same control update on 1/2/4/8 fake CPU
devices.  This is the GSPMD counterpart of the reference's sequential
rollout loop (dial-core.h:443-456) at the collective layout of SURVEY §2.6.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_dialmpc.envs import get_env
from tpu_dialmpc.planner.dial import DialConfig, MBDPI
from tpu_dialmpc.shard import ShardedMBDPI, make_mesh


@pytest.mark.slow
def test_sharded_go2_reverse_once_cross_mesh_equality():
    cfg = DialConfig(
        Hsample=10, Hnode=3, Nsample=64, ctrl_dt=0.02, temp_sample=0.05,
        horizon_diffuse_factor=0.9, diag_states=True,
    )
    env = get_env("go2_stand", n_substeps=1, dtype="float64")
    state = env.reset(jax.random.PRNGKey(0))
    Ybar = jnp.asarray(
        np.random.default_rng(1).uniform(-0.3, 0.3, (cfg.Hnode + 1, 12))
    )
    scale = jnp.full(cfg.Hnode + 1, 0.2)
    key = jax.random.PRNGKey(11)

    ref_y, ref_info = jax.jit(MBDPI(cfg, env).reverse_once)(
        state, key, Ybar, scale
    )
    ref_y = np.asarray(ref_y)
    assert np.all(np.isfinite(ref_y))
    # real-physics Q4 diagnostics: finite weighted state averages with the
    # right shapes, torso z near the standing height
    assert ref_info.qbar.shape == (cfg.Hsample + 1, env.model.nq)
    assert ref_info.qdbar.shape == (cfg.Hsample + 1, env.model.nv)
    assert ref_info.xbar.shape == (cfg.Hsample + 1, 3)
    assert np.all(np.isfinite(np.asarray(ref_info.qbar)))
    assert 0.15 < float(ref_info.xbar[-1, 2]) < 0.45

    for n_dev in (2, 4, 8):
        sharded = ShardedMBDPI(cfg, env, make_mesh(n_devices=n_dev))
        y, info = jax.jit(sharded.reverse_once)(state, key, Ybar, scale)
        np.testing.assert_allclose(np.asarray(y), ref_y, atol=1e-9)
        np.testing.assert_allclose(
            np.asarray(info.rews), np.asarray(ref_info.rews), atol=1e-9
        )
        np.testing.assert_allclose(
            np.asarray(info.qbar), np.asarray(ref_info.qbar), atol=1e-9
        )
