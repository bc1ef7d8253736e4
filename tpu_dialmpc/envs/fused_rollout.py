"""Fused-kernel batched rollouts for envs (TPU hot path).

`FusedRolloutMixin.rollout_batch(state, all_us)` rolls every candidate control
sequence through the fused Pallas substep kernel (dynamics/fused.py) and the
env's reward stack, returning the (B, T) reward matrix the planner scores.

This is the DIAL-MPC hot loop (SURVEY §3.1: ~42.6M sequential mj_step calls in
the reference benchmark).  Measured on TPU v5e at B=2049: the fused kernel
executes a full 21-substep chain in ~0.1-0.3 ms of device time vs ~27 ms for
the XLA-pipeline path — the entire physics lives in one Pallas call per
control step, with VMEM-resident state.

The mixin activates only when (a) the model is supported by the fused kernel,
(b) the default JAX backend is TPU, and (c) the env config doesn't disable it.
Otherwise `rollout_batch` returns None and the planner falls back to the
vmap(scan(env.step)) path — which is also the reference-parity path used by
the CPU float64 tests.

Requires the host env to provide:
  model, config, _torso_idx, _dtype,
  _ctrl_batch(action (B,nu), qpos (B,nq), qvel (B,nv)) -> ctrl (B,nu)
  _post_physics(qpos, qvel, site_xpos, torso_xpos, torso_xquat, torso_cvel,
                root_com, qfrc_actuator, info, ctrl) -> (reward, done, info')
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpu_dialmpc.dynamics import fused


class FusedRolloutMixin:
    _fused_cache = None

    def _fused_enabled(self) -> bool:
        mode = getattr(self.config, "fused", "auto")
        if mode == "off":
            return False
        if self._dtype != jnp.float32:
            return False  # the kernel is float32; float64 envs are parity paths
        if mode == "on":
            return True
        return jax.default_backend() == "tpu"

    def _get_fused_step(self, batch: int):
        """Build (and cache) the fused substep function for this env's model.

        The batch tile is (S, 128) with S adapted to the batch so small
        per-shard batches (e.g. 256 samples/chip on an 8-chip mesh) don't pad
        up to a full 1024-sample tile.
        """
        if self._fused_cache is None:
            self._fused_cache = {}
        if not self._fused_enabled() or not fused.supported(self.model):
            return None, None
        s = max(1, min(8, -(-batch // 128)))
        key = (self.config.n_substeps, s)
        if key not in self._fused_cache:
            # Contact-heavy models (crate scenes: ~56 constraint slots vs 4
            # for flat Go2) need more scoped VMEM than Mosaic's ~16 MB
            # default.  Shrinking the batch tile does NOT help — each (S,128)
            # value pads to a full (8,128) VMEM tile — so raise the
            # compiler's budget instead.
            n_slots = len(fused._meta(self.model).contact_slots)
            vmem_mb = 64 if n_slots > 10 else 0
            spec = fused.DerivedSpec(
                torso_body=self._torso_idx,
                want_sites=True,
                want_qfrc_actuator=True,
            )
            fn = fused.build_fused_step(
                self.model,
                self.config.n_substeps,
                spec,
                tile=(s, 128),
                vmem_limit_mb=vmem_mb,
            )
            self._fused_cache[key] = (fn, spec)
        return self._fused_cache[key]

    def step_lean(self, state, action):
        """Single-sample control step through the fused kernel (B=1).

        The real-time unit of the application is env.step + shift + anneals
        (dial-core-test.cpp:64-99); routing the executed step through the
        same Pallas substep kernel as the rollouts removes the XLA-pipeline
        single-sample path from the control loop (measured on v5e: the full
        control step drops from ~19.5 ms to the anneal-dominated ~7 ms).

        Accepts a full EnvState or LeanEnvState (only .pipeline.{qpos,qvel,
        qacc_warmstart} and .info are read); returns a LeanEnvState, or None
        when the fused kernel is unavailable (caller falls back to step).
        """
        from tpu_dialmpc.envs.base import LeanEnvState, LeanPipelineState

        fn, spec = self._get_fused_step(1)
        if fn is None:
            return None
        ps = state.pipeline
        dtype = self._dtype
        action = jnp.asarray(action, dtype)
        qpos = ps.qpos.astype(jnp.float32)[None]
        qvel = ps.qvel.astype(jnp.float32)[None]
        ws = ps.qacc_warmstart.astype(jnp.float32)[None]
        ctrl = self._ctrl_batch(action[None], qpos, qvel)
        qpos2, qvel2, ws2, der_flat = fn(qpos, qvel, ws, ctrl)
        der = fused.split_derived(self.model, spec, der_flat)
        reward, done, info2 = self._post_physics(
            qpos=qpos2[0],
            qvel=qvel2[0],
            site_xpos=der["site_xpos"][0],
            torso_xpos=der["torso_xpos"][0],
            torso_xquat=der["torso_xquat"][0],
            torso_cvel=der["torso_cvel"][0],
            root_com=der["root_com"][0],
            qfrc_actuator=der["qfrc_actuator"][0],
            info=state.info,
            ctrl=ctrl[0],
        )
        vb, ab = self._body_velocities(
            der["torso_xpos"][0],
            der["torso_xquat"][0],
            der["torso_cvel"][0],
            der["root_com"][0],
        )
        obs = jnp.concatenate(
            [info2.vel_tar, info2.ang_vel_tar, ctrl[0], qpos2[0], vb, ab,
             qvel2[0][6:]]
        )
        return LeanEnvState(
            pipeline=LeanPipelineState(
                qpos=qpos2[0], qvel=qvel2[0], qacc_warmstart=ws2[0]
            ),
            obs=obs,
            reward=jnp.asarray(reward, dtype),
            done=done,
            info=info2,
        )

    def rollout_batch(self, state, all_us: jnp.ndarray, want_states=False):
        """Batched rollout (B, T, nu) -> per-step rewards (B, T), or None.

        Every candidate starts from `state` (the correct Q1-fixed semantics);
        rewards/termination/info updates are the same code path `step` uses.
        With `want_states` also returns the (qpos, qvel, torso-xpos)
        trajectories for the planner's Q4 diagnostics (dial-core.h:577-589):
        (rewss (B,T), qss (B,T,nq), qdss (B,T,nv), xss (B,T,3)).
        """
        B = all_us.shape[0]
        fn, spec = self._get_fused_step(B)
        if fn is None:
            return None
        model = self.model

        def bcast(x):
            return jnp.broadcast_to(x, (B,) + x.shape)

        qpos0 = bcast(state.pipeline.qpos.astype(jnp.float32))
        qvel0 = bcast(state.pipeline.qvel.astype(jnp.float32))
        ws0 = bcast(state.pipeline.qacc_warmstart.astype(jnp.float32))
        info0 = jax.tree_util.tree_map(bcast, state.info)

        post = jax.vmap(
            lambda qpos, qvel, der, info, ctrl: self._post_physics(
                qpos=qpos,
                qvel=qvel,
                site_xpos=der["site_xpos"],
                torso_xpos=der["torso_xpos"],
                torso_xquat=der["torso_xquat"],
                torso_cvel=der["torso_cvel"],
                root_com=der["root_com"],
                qfrc_actuator=der["qfrc_actuator"],
                info=info,
                ctrl=ctrl,
            )
        )

        def body(carry, us_t):
            qpos, qvel, ws, info = carry
            ctrl = self._ctrl_batch(us_t, qpos, qvel)
            qpos2, qvel2, ws2, der_flat = fn(qpos, qvel, ws, ctrl)
            der = fused.split_derived(model, spec, der_flat)
            reward, done, info2 = post(qpos2, qvel2, der, info, ctrl)
            out = reward
            if want_states:
                out = (reward, qpos2, qvel2, der["torso_xpos"])
            return (qpos2, qvel2, ws2, info2), out

        us_t_first = jnp.swapaxes(all_us.astype(jnp.float32), 0, 1)  # (T, B, nu)
        _, outs = jax.lax.scan(body, (qpos0, qvel0, ws0, info0), us_t_first)
        if want_states:
            # (T, B, ...) -> (B, T, ...)
            return tuple(jnp.swapaxes(o, 0, 1) for o in outs)
        return jnp.swapaxes(outs, 0, 1)  # (B, T)
