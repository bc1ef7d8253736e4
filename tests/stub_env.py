"""Stub physics env with the FusedRolloutMixin interface, for shard tests.

`StubFusedEnv` mimics the structural contract of a fused-kernel env
(envs/fused_rollout.py): an EnvState-shaped pytree with a `.pipeline`
(qpos/qvel/qacc_warmstart) and `.info`, a `step`, and a batched
`rollout_batch(state, all_us, want_states=...)` whose `_get_fused_step`
probe reports support.  Dynamics are linear (qpos' = a·qpos + b·u), so the
batched path is exactly vmap of the scalar path and sharded/single-device
results must agree to float64 precision.

This makes the `ShardedMBDPI.rollout_us_batch` shard_map branch
(shard/planner.py) — which on real hardware only triggers with the Pallas
kernel on a multi-chip TPU mesh — executable on the fake-device CPU mesh.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp


class StubPipeline(NamedTuple):
    qpos: jnp.ndarray  # (4,)
    qvel: jnp.ndarray  # (4,)
    qacc_warmstart: jnp.ndarray  # (4,)


class StubState(NamedTuple):
    pipeline: StubPipeline
    info: jnp.ndarray  # scalar step counter
    reward: jnp.ndarray
    done: jnp.ndarray
    obs: jnp.ndarray


class StubFusedEnv:
    """Linear-dynamics env exposing the fused-rollout interface."""

    nu = 4
    A = 0.9
    B = 0.1

    def __init__(self, fused: bool = True):
        self._fused = fused
        if fused:
            self.seen_batches = []  # rollout_batch batch sizes (trace-time)

    @property
    def action_size(self):
        return self.nu

    def reset(self, rng=None):
        z = jnp.zeros(self.nu)
        return StubState(
            pipeline=StubPipeline(qpos=z, qvel=z, qacc_warmstart=z),
            info=jnp.asarray(0.0),
            reward=jnp.asarray(0.0),
            done=jnp.asarray(False),
            obs=z,
        )

    def _step_math(self, qpos, qvel, u):
        qpos2 = self.A * qpos + self.B * u
        qvel2 = qpos2 - qpos
        reward = -jnp.sum((qpos2 - 1.0) ** 2, axis=-1) + 0.01 * jnp.sum(
            qvel2, axis=-1
        )
        return qpos2, qvel2, reward

    def step(self, state: StubState, u: jnp.ndarray) -> StubState:
        qpos2, qvel2, reward = self._step_math(
            state.pipeline.qpos, state.pipeline.qvel, u
        )
        return StubState(
            pipeline=StubPipeline(
                qpos=qpos2, qvel=qvel2, qacc_warmstart=state.pipeline.qacc_warmstart
            ),
            info=state.info + 1.0,
            reward=reward,
            done=jnp.asarray(False),
            obs=qpos2,
        )

    # --- fused-rollout interface (envs/fused_rollout.py contract) ---
    def _get_fused_step(self, batch: int):
        if not self._fused:
            return None, None
        return "stub-kernel", None

    def rollout_batch(self, state: StubState, all_us, want_states=False):
        if not self._fused:
            return None
        B = all_us.shape[0]
        self.seen_batches.append(B)
        qpos0 = jnp.broadcast_to(state.pipeline.qpos, (B, self.nu))
        qvel0 = jnp.broadcast_to(state.pipeline.qvel, (B, self.nu))

        def body(carry, us_t):
            qpos, qvel = carry
            qpos2, qvel2, reward = self._step_math(qpos, qvel, us_t)
            out = (
                (reward, qpos2, qvel2, qpos2[:, :3]) if want_states else reward
            )
            return (qpos2, qvel2), out

        us_t = jnp.swapaxes(all_us, 0, 1)  # (T, B, nu)
        _, outs = jax.lax.scan(body, (qpos0, qvel0), us_t)
        if want_states:
            return tuple(jnp.swapaxes(o, 0, 1) for o in outs)
        return jnp.swapaxes(outs, 0, 1)
