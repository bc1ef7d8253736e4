"""Checkpoint / resume for the receding-horizon control loop.

The reference has no persistence at all (SURVEY §5); its nearest analog keeps
the whole plan in RAM for replay (dial-core-simulate.cpp:23-24).  The planner
is stateless per solve, so a control run is fully resumable from
(qpos, qvel, warmstart, Y0, StateInfo, PRNG key) — a few KB, serialized as npz
per control step or at intervals.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tpu_dialmpc.envs.base import EnvState, StateInfo
from tpu_dialmpc.planner.dial import DialConfig


def _key_data(key) -> np.ndarray:
    """Raw key bits for either typed or legacy uint32 PRNG keys."""
    try:
        return np.asarray(jax.random.key_data(key))
    except (TypeError, ValueError):
        return np.asarray(key)


def _wrap_key(arr):
    a = jnp.asarray(arr)
    if a.dtype == jnp.uint32:
        return a  # legacy key format
    return jax.random.wrap_key_data(a)


def save(path: str, state: EnvState, Y0, key, dial_cfg: DialConfig, step: int):
    """Serialize the full control-loop state to one .npz."""
    ps = state.pipeline
    np.savez(
        path,
        meta=json.dumps(
            {"dial": dataclasses.asdict(dial_cfg), "step": int(step)}
        ),
        qpos=np.asarray(ps.qpos),
        qvel=np.asarray(ps.qvel),
        qacc_warmstart=np.asarray(ps.qacc_warmstart),
        Y0=np.asarray(Y0),
        key=_key_data(key),
        reward=np.asarray(state.reward),
        done=np.asarray(state.done),
        **{f"info_{f}": np.asarray(getattr(state.info, f)) for f in StateInfo._fields if f != "rng"},
        info_rng=_key_data(state.info.rng),
    )


def load(path: str, env) -> Tuple[EnvState, jnp.ndarray, jnp.ndarray, DialConfig, int]:
    """Rebuild (EnvState, Y0, key, DialConfig, step) from a checkpoint.

    Re-runs the pipeline forward pass at the stored (qpos, qvel) to repopulate
    derived kinematic fields, then restores the warmstart.
    """
    from tpu_dialmpc.dynamics import pipeline

    data = np.load(path)
    meta = json.loads(str(data["meta"]))
    dial_cfg = DialConfig(**meta["dial"])
    ps = pipeline.init(
        env.model,
        jnp.asarray(data["qpos"]),
        jnp.asarray(data["qvel"]),
    )._replace(qacc_warmstart=jnp.asarray(data["qacc_warmstart"]))
    info_kwargs = {}
    for f in StateInfo._fields:
        if f == "rng":
            info_kwargs[f] = _wrap_key(data["info_rng"])
        else:
            info_kwargs[f] = jnp.asarray(data[f"info_{f}"])
    info = StateInfo(**info_kwargs)
    state = EnvState(
        pipeline=ps,
        obs=env._get_obs(ps, info, jnp.zeros(env.action_size, ps.qpos.dtype)),
        reward=jnp.asarray(data["reward"]),
        done=jnp.asarray(data["done"]),
        info=info,
    )
    key = _wrap_key(data["key"])
    return state, jnp.asarray(data["Y0"]), key, dial_cfg, meta["step"]
