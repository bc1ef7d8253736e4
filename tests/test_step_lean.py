"""Lean fused control step (envs/fused_rollout.py step_lean).

The fused kernel only runs on TPU, so the numerical equality check
step_lean-vs-env.step is hardware-gated; the structural behavior (None
fallback on CPU, runner routing) is always tested.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_dialmpc.envs import get_env
from tpu_dialmpc.envs.base import LeanEnvState, to_lean
from tpu_dialmpc.planner.runner import _lean_capable

_ON_TPU = jax.default_backend() == "tpu"


def test_step_lean_returns_none_without_fused_kernel():
    env = get_env("go2_stand", n_substeps=1)
    if _ON_TPU:
        pytest.skip("fused kernel available here")
    state = env.reset(jax.random.PRNGKey(0))
    assert env.step_lean(state, jnp.zeros(env.action_size)) is None
    assert not _lean_capable(env)


def test_to_lean_structure():
    env = get_env("go2_stand", n_substeps=1)
    state = env.reset(jax.random.PRNGKey(0))
    lean = to_lean(state)
    assert isinstance(lean, LeanEnvState)
    np.testing.assert_array_equal(
        np.asarray(lean.pipeline.qpos), np.asarray(state.pipeline.qpos)
    )
    assert lean.info is state.info
    # the planner's lean-carry helpers accept either state flavor
    from tpu_dialmpc.planner.dial import DialConfig, MBDPI

    mb = MBDPI(DialConfig(Hsample=4, Hnode=2, Nsample=2), env)
    carry = mb._lean(lean)
    restored = mb._restore(lean, carry)
    assert isinstance(restored, LeanEnvState)


@pytest.mark.skipif(not _ON_TPU, reason="fused kernel needs TPU")
@pytest.mark.parametrize("task", ["go2_stand", "h1_walk"])
def test_step_lean_matches_env_step(task):
    env = get_env(task, n_substeps=8)
    state = env.reset(jax.random.PRNGKey(0))
    act = jnp.asarray(
        np.random.default_rng(0).uniform(-0.3, 0.3, env.action_size),
        jnp.float32,
    )
    s_full = jax.jit(env.step)(state, act)
    s_lean = jax.jit(env.step_lean)(state, act)
    assert s_lean is not None
    np.testing.assert_allclose(
        np.asarray(s_full.pipeline.qpos),
        np.asarray(s_lean.pipeline.qpos),
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(s_full.pipeline.qvel),
        np.asarray(s_lean.pipeline.qvel),
        atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(s_full.obs), np.asarray(s_lean.obs), atol=1e-4
    )
    assert abs(float(s_full.reward) - float(s_lean.reward)) < 1e-4
    assert bool(s_full.done) == bool(s_lean.done)
