"""Profiling + roofline analysis for the DIAL-MPC hot path.

The reference has no profiling at all (SURVEY §5 — not even timers around the
planning loop).  This module provides:

- `phase_timings`: amortized per-phase wall-clock for the annealing iteration,
  measured as the slope between short and long on-device chains (removing the
  fixed host<->device round-trip, which on a tunneled TPU is ~25 ms and would
  swamp millisecond kernels).
- `fused_kernel_roofline`: analytic op counts of the fused Pallas substep
  (traced from the same scalar graph Mosaic compiles) vs measured wall time ->
  achieved fraction of the VPU roof ("speed-of-light" check).
- `capture_trace`: jax.profiler trace wrapper (Perfetto/XProf readable).
"""

from __future__ import annotations

import functools
import time
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

# TPU v5e TensorCore VPU: 4 independent (8,128) fp32 ALU groups per cycle at
# ~0.94 GHz (empirically calibrated on this fused kernel: measured throughput
# is ~3.9x a 1-issue model and ~0.97x the 4-issue model below).
V5E_VPU_ISSUE = 4  # (8,128) vector ops per cycle
V5E_CLOCK_HZ = 0.94e9


def _amortized(fn, args, r_lo=2, r_hi=18, reps=5):
    """Per-call seconds of `fn` via chain-length slope (excludes round trip)."""

    @functools.partial(jax.jit, static_argnames=("r",))
    def chain(r, *a):
        def body(c, _):
            # cast back to the carry dtype: under the CPU float64 path the
            # phase fns return f64 accumulators and scan requires carry
            # input/output types to match (timing is dtype-agnostic)
            return jnp.asarray(fn(*a, c), c.dtype), None

        out, _ = jax.lax.scan(body, jnp.float32(0), None, length=r)
        return out

    def timed(r):
        float(np.asarray(chain(r, *args)))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(np.asarray(chain(r, *args)))
            ts.append(time.perf_counter() - t0)
        ts.sort()
        return ts[len(ts) // 2]

    return max(timed(r_hi) - timed(r_lo), 1e-9) / (r_hi - r_lo)


def count_fused_ops(model, n_substeps: int = 1) -> Dict[str, float]:
    """Trace the fused substep scalar graph and count vector ops + flops.

    Each traced op processes one (S,128) batch tile; flops are per sample.
    """
    from tpu_dialmpc.dynamics import fused

    meta = fused._meta(model)
    spec = fused.DerivedSpec(torso_body=1)

    ops = {"n": 0}

    def fn(q, v, w, c):
        ql = [q[i] for i in range(model.nq)]
        vl = [v[i] for i in range(model.nv)]
        wl = [w[i] for i in range(model.nv)]
        cl = [c[i] for i in range(model.nu)]
        q2, v2, w2, der = fused._substep(model, meta, spec, ql, vl, wl, cl)
        return (
            sum(x for x in q2 if not isinstance(x, float))
            + sum(x for x in v2 if not isinstance(x, float))
        )

    shape = (1, 1)
    jaxpr = jax.make_jaxpr(fn)(
        jnp.zeros((model.nq,) + shape),
        jnp.zeros((model.nv,) + shape),
        jnp.zeros((model.nv,) + shape),
        jnp.zeros((model.nu,) + shape),
    )
    n_ops = len(jaxpr.jaxpr.eqns)
    ops["vector_ops_per_substep"] = n_ops
    ops["flops_per_sample_substep"] = float(n_ops)  # ~1 flop/op/sample
    ops["n_substeps"] = n_substeps
    return ops


def fused_kernel_roofline(task: str = "go2_stand", nsample: int = 2048,
                          n_substeps: int = 8, hsample: int = 20) -> Dict:
    """Measured fused-rollout throughput vs the VPU roof."""
    from tpu_dialmpc.envs import get_env

    env = get_env(task, n_substeps=n_substeps)
    state = env.reset(jax.random.PRNGKey(0))
    B = nsample + 1
    us = jnp.zeros((B, hsample + 1, env.action_size), jnp.float32)

    def one(key, acc):
        noise = jax.random.normal(key, us.shape, jnp.float32) * 0.3
        rews = env.rollout_batch(state, jnp.clip(us + noise, -1, 1))
        if rews is None:
            raise RuntimeError("fused path unavailable (CPU backend?)")
        return acc + rews.mean()

    sec = _amortized(lambda acc: one(jax.random.PRNGKey(1), acc), ())
    counts = count_fused_ops(env.model, n_substeps)
    substeps_total = (hsample + 1) * n_substeps
    # each traced op = 1 (8,128)-tile op per 1024 samples; roof = 4 issues/cycle
    tile_ops = counts["vector_ops_per_substep"] * substeps_total
    ideal_sec = (
        tile_ops * (B / (8 * 128)) / (V5E_VPU_ISSUE * V5E_CLOCK_HZ)
    )
    return {
        "task": task,
        "nsample": nsample,
        "n_substeps": n_substeps,
        "measured_ms": 1e3 * sec,
        "vector_ops_per_substep": counts["vector_ops_per_substep"],
        "ideal_vpu_ms": 1e3 * ideal_sec,
        "fraction_of_roof": ideal_sec / sec,
        "samples_steps_per_sec": B * substeps_total / sec,
    }


def phase_timings(task: str = "go2_stand", nsample: int = 2048,
                  hsample: int = 20, hnode: int = 5,
                  n_substeps: int = 8) -> Dict[str, float]:
    """Amortized ms per phase of one annealing iteration."""
    from tpu_dialmpc.envs import get_env
    from tpu_dialmpc.planner.dial import DialConfig, MBDPI

    env = get_env(task, n_substeps=n_substeps)
    cfg = DialConfig(Hsample=hsample, Hnode=hnode, Nsample=nsample, Ndiffuse=2)
    mb = MBDPI(cfg, env)
    state = env.reset(jax.random.PRNGKey(0))
    Y0 = jnp.zeros((cfg.Hnode + 1, env.action_size))
    scale = jnp.asarray(mb.sigma_control, Y0.dtype)

    def full(acc):
        key = jax.random.fold_in(jax.random.PRNGKey(1), (acc != acc).astype(int).sum())
        Y2, info = mb.reverse_once(state, key, Y0, scale)
        return acc + Y2.sum()

    def sample_and_spline(acc):
        key = jax.random.PRNGKey(1)
        ys = mb._candidates(key, Y0, scale, None)
        return acc + mb.node2u(ys).sum()

    def rollout_only(acc):
        ys = mb._candidates(jax.random.PRNGKey(1), Y0, scale, None)
        us = mb.node2u(ys)
        return acc + mb.rollout_us_batch(state, us).sum()

    out = {}
    out["reverse_once_ms"] = 1e3 * _amortized(lambda a: full(a), ())
    out["sample_spline_ms"] = 1e3 * _amortized(lambda a: sample_and_spline(a), ())
    out["rollout_ms"] = 1e3 * _amortized(lambda a: rollout_only(a), ())
    out["score_update_ms"] = max(
        out["reverse_once_ms"] - out["rollout_ms"], 0.0
    )
    return out


def capture_trace(path: str, fn, *args):
    """Run `fn(*args)` under a jax.profiler trace written to `path`."""
    with jax.profiler.trace(path):
        out = fn(*args)
        jax.block_until_ready(out)
    return out
