"""Functional environment base: state pytrees and the Env protocol.

Counterpart of the reference's EnvState/StateInfo structs
(dial_mpc_eigen/include/unitree-go2-env.h:55-77), with JAX PRNG keys instead of
mt19937 (reference quirk Q3) and a pure `step(state, action) -> state` that
vmaps across thousands of candidate rollouts.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from tpu_dialmpc.dynamics.pipeline import PipelineState


class StateInfo(NamedTuple):
    rng: jnp.ndarray  # jax PRNG key
    pos_tar: jnp.ndarray  # (3,)
    vel_tar: jnp.ndarray  # (3,)
    ang_vel_tar: jnp.ndarray  # (3,)
    yaw_tar: jnp.ndarray  # scalar
    step: jnp.ndarray  # int32 scalar
    # extras carried for config-gated features (contact/air-time tracking,
    # reference: dead-code env dial_mpc/include/UnitreeGo2Env.h:415-439)
    z_feet: jnp.ndarray  # (n_feet,)
    z_feet_tar: jnp.ndarray  # (n_feet,)
    last_contact: jnp.ndarray  # (n_feet,) bool
    feet_air_time: jnp.ndarray  # (n_feet,)


class EnvState(NamedTuple):
    pipeline: PipelineState
    obs: jnp.ndarray
    reward: jnp.ndarray
    done: jnp.ndarray
    info: StateInfo


class LeanPipelineState(NamedTuple):
    """Live physics state only (qpos, qvel, warmstart) — the scan carry.

    The full PipelineState additionally stores the derived kinematic
    quantities of the last forward pass; the fused-kernel control path
    (envs/fused_rollout.py step_lean) consumes those as named reward inputs
    and never materializes the full-body arrays, so the real-time control
    loop carries only this."""

    qpos: jnp.ndarray  # (nq,)
    qvel: jnp.ndarray  # (nv,)
    qacc_warmstart: jnp.ndarray  # (nv,)


class LeanEnvState(NamedTuple):
    """EnvState with a LeanPipelineState — same field names, so planner/
    runner/checkpoint code paths that read .pipeline.qpos / .reward / .info
    work on either."""

    pipeline: LeanPipelineState
    obs: jnp.ndarray
    reward: jnp.ndarray
    done: jnp.ndarray
    info: "StateInfo"


def to_lean(state: EnvState) -> LeanEnvState:
    ps = state.pipeline
    return LeanEnvState(
        pipeline=LeanPipelineState(
            qpos=ps.qpos, qvel=ps.qvel, qacc_warmstart=ps.qacc_warmstart
        ),
        obs=state.obs,
        reward=state.reward,
        done=state.done,
        info=state.info,
    )
