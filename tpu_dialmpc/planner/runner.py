"""Receding-horizon DIAL-MPC driver (counterpart of dial-core-test.cpp:6-109).

Two execution modes:
- `run`: host loop with per-step telemetry callbacks (control-latency path);
  the jitted control step keeps the device busy, Y0[0] stays on-device, and
  only small diagnostics cross to the host.
- `run_scan`: the whole n_steps rollout is one `lax.scan` on device — the
  benchmark path (no host syncs at all), returning stacked trajectories
  (the `all_us`/`all_xs` analog of dial-core-simulate.cpp:83-171 for replay).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from tpu_dialmpc.envs.base import EnvState, to_lean
from tpu_dialmpc.planner.dial import DialConfig, MBDPI


def _lean_capable(env) -> bool:
    """True when the env can run the control step through the fused kernel
    (envs/fused_rollout.py step_lean) — TPU with a supported model."""
    return (
        getattr(env, "step_lean", None) is not None
        and getattr(env, "_get_fused_step", None) is not None
        and env._get_fused_step(1)[0] is not None
    )


class RunResult(NamedTuple):
    rewards: jnp.ndarray  # (n_steps,)
    dones: jnp.ndarray  # (n_steps,)
    qpos: jnp.ndarray  # (n_steps, nq) executed trajectory
    qvel: jnp.ndarray  # (n_steps, nv)
    us: jnp.ndarray  # (n_steps, nu) executed controls
    final_state: EnvState
    final_Y0: jnp.ndarray
    # state PRECEDING the first recorded step (reset state, or the resume
    # checkpoint's): us[0] was executed from here.  Consumers pairing
    # actions with states (cli render --torques) need it because qpos[t]
    # is post-step.  warmstart0 is its qacc_warmstart: the truncated-Newton
    # solver's starting point is observable (dynamics/pipeline.py), so an
    # exact replay of a resumed run must restore it too (it is zero after a
    # reset but generally nonzero in a checkpoint).
    qpos0: jnp.ndarray | None = None
    qvel0: jnp.ndarray | None = None
    warmstart0: jnp.ndarray | None = None


def make_control_step(mbdpi: MBDPI, n_diffuse: int):
    """One receding-horizon step: execute, shift, anneal (dial-core-test.cpp:64-99).

    On TPU with a fused-kernel env the executed step rides the same Pallas
    substep kernel as the rollouts (step_lean) and the loop carries only the
    lean state — the single-sample XLA pipeline would otherwise dominate the
    control-step latency (~13 of ~19.5 ms at the benchmark config)."""
    lean = _lean_capable(mbdpi.env)

    @jax.jit
    def control_step(state: EnvState, Y0: jnp.ndarray, key: jnp.ndarray):
        action = Y0[0]
        if lean:
            state2 = mbdpi.env.step_lean(state, action)
        else:
            state2 = mbdpi.env.step(state, action)
        Y1 = mbdpi.shift(Y0)
        Y2, infos = mbdpi.improve(state2, Y1, key, n_diffuse)
        return state2, Y2, infos

    return control_step


def run(
    env,
    cfg: DialConfig,
    telemetry=None,
    n_steps: Optional[int] = None,
    resume: Optional[tuple] = None,
    checkpoint_path: Optional[str] = None,
    checkpoint_every: int = 50,
    max_retries: int = 0,
) -> RunResult:
    """Host-loop driver with optional telemetry sink and checkpoint/resume.

    `resume=(state, Y0, key, t0)` continues a run from a checkpoint.load;
    `checkpoint_path` writes the full control-loop state every
    `checkpoint_every` steps (and at the end).

    Failure recovery (the reference's only failure path is std::exit(1),
    unitree-go2-env.h:254-259): with `max_retries > 0` and a checkpoint path,
    a step that raises is retried from the last on-disk checkpoint — the
    planner is stateless per solve, so (qpos, qvel, warmstart, Y0, info, key)
    fully determines the continuation.
    """
    mbdpi = MBDPI(cfg, env)
    lean = _lean_capable(env)
    if resume is not None:
        state, Y0, key, t0 = resume
        if lean:
            state = to_lean(state)
    else:
        key = jax.random.PRNGKey(cfg.seed)
        key, reset_key, warm_key = jax.random.split(key, 3)
        state = env.reset(reset_key)
        if lean:
            state = to_lean(state)
        Y0 = jnp.zeros((cfg.Hnode + 1, env.action_size), state.obs.dtype)
        Y0 = jax.jit(mbdpi.reverse)(state, Y0, warm_key)
        t0 = 0

    qpos0, qvel0 = state.pipeline.qpos, state.pipeline.qvel
    warmstart0 = state.pipeline.qacc_warmstart

    step_init = make_control_step(mbdpi, cfg.Ndiffuse_init)
    step_rest = make_control_step(mbdpi, cfg.Ndiffuse)

    n = cfg.n_steps if n_steps is None else n_steps
    if t0 >= n:
        raise ValueError(
            f"nothing to run: resume step {t0} >= n_steps {n} (the checkpoint "
            "was written at the end of its run; raise n_steps to continue)"
        )
    rewards, dones, qpos_traj, qvel_traj, us_traj = [], [], [], [], []
    retries_left = max_retries
    emitted_hwm = t0  # telemetry high-water mark: don't re-emit replayed steps
    t = t0
    while t < n:
        key, k = jax.random.split(key)
        fn = step_init if t == 0 else step_rest
        action = Y0[0]
        try:
            state, Y0, infos = fn(state, Y0, k)
        except Exception:
            import os

            if (
                retries_left <= 0
                or not checkpoint_path
                or not os.path.exists(checkpoint_path)
            ):
                raise  # no checkpoint from THIS run to recover from
            retries_left -= 1
            from tpu_dialmpc import checkpoint

            state, Y0, key, _, t_ck = checkpoint.load(checkpoint_path, env)
            if not (t0 <= t_ck <= t):
                raise  # stale checkpoint from a different run
            if lean:
                # match the jitted control step's traced structure — a full
                # EnvState here would silently retrace/recompile the whole
                # improve graph once per recovery (like the resume path above)
                state = to_lean(state)
            # drop records past the checkpoint and replay from there
            del rewards[t_ck - t0:], dones[t_ck - t0:]
            del qpos_traj[t_ck - t0:], qvel_traj[t_ck - t0:], us_traj[t_ck - t0:]
            t = t_ck
            continue
        rewards.append(state.reward)
        dones.append(state.done)
        qpos_traj.append(state.pipeline.qpos)
        qvel_traj.append(state.pipeline.qvel)
        us_traj.append(action)
        if telemetry is not None and t >= emitted_hwm:
            telemetry.emit_step(t, state, infos)
            emitted_hwm = t + 1
        if checkpoint_path and (
            (t + 1) % checkpoint_every == 0 or t == n - 1
        ):
            from tpu_dialmpc import checkpoint

            checkpoint.save(checkpoint_path, state, Y0, key, cfg, t + 1)
        t += 1
    return RunResult(
        rewards=jnp.stack(rewards),
        dones=jnp.stack(dones),
        qpos=jnp.stack(qpos_traj),
        qvel=jnp.stack(qvel_traj),
        us=jnp.stack(us_traj),
        final_state=state,
        final_Y0=Y0,
        qpos0=qpos0,
        qvel0=qvel0,
        warmstart0=warmstart0,
    )


# Single-execution budget for run_scan, in sample-substeps (Nsample+1
# candidates x (Hsample+1) rollout steps x n_substeps x Ndiffuse x control
# steps).  A monolithic 600-step scan at Nsample=8192 on a crate scene is a
# multi-minute single XLA execution, and the tunneled-TPU service's
# watchdog kills the worker mid-run ("TPU worker crashed or restarted" —
# reproduced twice at that shape; the raw kernel and single reverse_once
# at the same batch are fine).  Above this budget the scan is split into
# chunks with a host sync between them; the carried (state, Y0, key)
# triple makes the chunked execution step-for-step identical to the
# monolithic one (same key-split sequence).  At Nsample=2048 the full
# 600-step crate-climb gate stays monolithic (~5.1e8 < budget), keeping
# the exact programs the round artifacts were measured with.
RUN_SCAN_SAMPLE_SUBSTEP_BUDGET = 6e8


def run_scan(
    env,
    cfg: DialConfig,
    n_steps: Optional[int] = None,
    chunk: Optional[int] = None,
) -> RunResult:
    """Fully on-device driver: lax.scan over control steps (bench path).

    `chunk` caps the number of control steps per device execution; None
    picks it automatically from RUN_SCAN_SAMPLE_SUBSTEP_BUDGET (monolithic
    whenever the workload fits the single-execution budget).
    """
    mbdpi = MBDPI(cfg, env)
    lean = _lean_capable(env)
    key = jax.random.PRNGKey(cfg.seed)
    key, reset_key, warm_key = jax.random.split(key, 3)
    state = env.reset(reset_key)
    if lean:
        state = to_lean(state)
    Y0 = jnp.zeros((cfg.Hnode + 1, env.action_size), state.obs.dtype)
    n = cfg.n_steps if n_steps is None else n_steps

    if chunk is None:
        per_step = (
            (cfg.Nsample + 1)
            * (cfg.Hsample + 1)
            * getattr(env.config, "n_substeps", 1)
            * max(cfg.Ndiffuse, 1)
        )
        if per_step * n <= RUN_SCAN_SAMPLE_SUBSTEP_BUDGET:
            chunk = n  # monolithic (the validated gate/bench program)
        else:
            chunk = max(1, int(RUN_SCAN_SAMPLE_SUBSTEP_BUDGET // per_step))

    def exec_step(state, action):
        return env.step_lean(state, action) if lean else env.step(state, action)

    def first_step(carry):
        state, Y0, key = carry
        key, k = jax.random.split(key)
        action = Y0[0]
        state2 = exec_step(state, action)
        Y1 = mbdpi.shift(Y0)
        Y2, _ = mbdpi.improve(state2, Y1, k, cfg.Ndiffuse_init)
        return (state2, Y2, key), (
            state2.reward, state2.done, state2.pipeline.qpos,
            state2.pipeline.qvel, action,
        )

    def body(carry, _):
        state, Y0, key = carry
        key, k = jax.random.split(key)
        action = Y0[0]
        state2 = exec_step(state, action)
        Y1 = mbdpi.shift(Y0)
        Y2, _ = mbdpi.improve(state2, Y1, k, cfg.Ndiffuse)
        return (state2, Y2, key), (
            state2.reward, state2.done, state2.pipeline.qpos,
            state2.pipeline.qvel, action,
        )

    @functools.partial(jax.jit, static_argnames=("length", "first"))
    def run_chunk(state, Y0, key, length, first):
        carry = (state, Y0, key)
        if first:
            Y0w = mbdpi.reverse(state, Y0, warm_key)
            carry = (state, Y0w, key)
            carry, out0 = first_step(carry)
            if length > 1:
                carry, outs = jax.lax.scan(body, carry, None, length=length - 1)
                stacked = jax.tree_util.tree_map(
                    lambda a, b: jnp.concatenate([a[None], b], axis=0),
                    out0, outs,
                )
            else:
                stacked = jax.tree_util.tree_map(lambda a: a[None], out0)
        else:
            carry, stacked = jax.lax.scan(body, carry, None, length=length)
        state, Y0, key = carry
        return state, Y0, key, stacked

    qpos0, qvel0 = state.pipeline.qpos, state.pipeline.qvel
    warmstart0 = state.pipeline.qacc_warmstart
    outs_chunks = []
    done_steps = 0
    while done_steps < n:
        length = min(chunk, n - done_steps)
        state, Y0, key, stacked = run_chunk(
            state, Y0, key, length, done_steps == 0
        )
        # host sync between chunks bounds each device execution
        jax.block_until_ready(stacked)
        outs_chunks.append(stacked)
        done_steps += length
    if len(outs_chunks) == 1:
        rewards, dones, qpos, qvel, us = outs_chunks[0]
    else:
        rewards, dones, qpos, qvel, us = jax.tree_util.tree_map(
            lambda *xs: jnp.concatenate(xs, axis=0), *outs_chunks
        )
    return RunResult(
        rewards=rewards,
        dones=dones,
        qpos=qpos,
        qvel=qvel,
        us=us,
        final_state=state,
        final_Y0=Y0,
        qpos0=qpos0,
        qvel0=qvel0,
        warmstart0=warmstart0,
    )
