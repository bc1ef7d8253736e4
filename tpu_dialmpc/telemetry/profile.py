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

# The roofline is calibrated INDEPENDENTLY of the kernel under test (the
# round-2 version tuned a clock constant on the fused kernel itself, which
# made the "speed-of-light fraction" circular and let it exceed 1.0):
#   - vpu_peak_eqn_ops_per_sec(): a VMEM-resident FMA-chain microbenchmark
#     (512 (8,128) tiles x 32-deep dependent FMAs per scan step — small
#     enough to never touch HBM, deep enough to amortize loop overhead).
#     Each FMA is credited as TWO jaxpr arithmetic eqns (mul+add), i.e. the
#     peak is "the fastest rate at which jaxpr arithmetic eqns can retire
#     under maximal mul+add fusion" — a kernel counted in the same unit can
#     only reach 1.0, never exceed it.
#   - hbm_copy_bytes_per_sec(): streaming read+write bandwidth measured on a
#     64 MiB carry chained through a scan.
# The binding roof is max(compute_ideal_time, memory_ideal_time).
# Transcendentals (sqrt/div/exp) are counted at weight 1 like add/mul even
# though they cost multiple VPU passes, which UNDERestimates ideal time —
# the reported fraction is therefore conservative (a lower bound).
#
# Estimators: the tunneled tile is time-shared, so single timings carry
# multiplicative interference (observed: 12-20% run-to-run swing on BOTH the
# kernel and the microbenchmarks).  All measurements therefore use
# capability estimators: MIN time over repetitions for anything measured
# (interference is strictly additive, so min converges to the true time),
# and the roof takes the MAX over calibration attempts (a capability lower
# bound can only be raised by evidence).  Self-consistency: any measured
# kernel retirement rate is itself evidence for the roof — a VPU program
# cannot retire eqn-ops faster than the hardware peak — so
# fused_kernel_roofline raises the roof to the observed rate when a quiet
# kernel window beats a noisy microbench window.  This keeps the reported
# fraction <= 1.0 by physical argument, not by tuning.


def _amortized(fn, args, r_lo=2, r_hi=18, reps=7, attempts=1, settle_s=0.0,
               return_attempts=False):
    """Per-call seconds of `fn` via chain-length slope (excludes round trip).

    Min-of-reps at each chain length: interference on the time-shared tile
    is additive, so the min is the capability estimator (see module
    docstring); the short chain (r=18 is ~50 ms) makes RTT jitter at the
    median worth ~12% of a 2.5 ms kernel.  `attempts` repeats the whole
    slope measurement (compiled chain reused) separated by `settle_s`,
    taking the min slope — widens the quiet-window search when tile
    interference is bursty on the scale of seconds.

    `return_attempts=True` additionally returns every attempt's slope so
    callers can publish the run-to-run spread (BENCH provenance: a single
    reported number on a time-shared tile invites cherry-picking)."""

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
        return min(ts)

    slopes = []
    for i in range(max(1, attempts)):
        if i and settle_s:
            time.sleep(settle_s)
        slopes.append(
            max(timed(r_hi) - timed(r_lo), 1e-9) / (r_hi - r_lo)
        )
    if return_attempts:
        return min(slopes), slopes
    return min(slopes)


@functools.lru_cache(maxsize=1)
def vpu_peak_eqn_ops_per_sec() -> float:
    """Measured peak jaxpr-arith-eqn retirement rate (see module docstring).

    A 32-deep dependent FMA chain per scan step over 512 independent (8,128)
    f32 tiles (2 MiB — VMEM-resident): dependencies are element-local, so
    the VPU pipelines across tiles; the a/b operands are runtime arrays so
    XLA cannot algebraically collapse the affine chain."""
    K, TILES = 32, 512
    x0 = jnp.linspace(0.5, 1.5, TILES * 8 * 128, dtype=jnp.float32).reshape(
        TILES * 8, 128
    )
    a = jnp.full_like(x0, 1.0000001)
    b = jnp.full_like(x0, 1e-9)

    @functools.partial(jax.jit, static_argnames=("r",))
    def chain(x, a, b, r):
        def body(c, _):
            for _ in range(K):
                c = c * a + b
            return c, None

        y, _ = jax.lax.scan(body, x, None, length=r)
        return y.sum()

    # the tunneled round-trip is ~30 ms; chain lengths are sized so the
    # arithmetic signal (~15 us/step) is ~10x the run-to-run noise.
    # Two calibration attempts, max rate: the roof is a capability lower
    # bound, only raisable by evidence (module docstring).
    sec = min(
        _amortized_raw(lambda r: chain(x0, a, b, r), r_lo=64, r_hi=2048)
        for _ in range(2)
    )
    return 2.0 * K * TILES / sec  # 2 eqns (mul+add) per FMA per tile


@functools.lru_cache(maxsize=1)
def hbm_copy_bytes_per_sec() -> float:
    """Measured streaming HBM bandwidth: a 256 MiB f32 carry scanned through
    a scale-op (each step reads + writes the full array).  256 MiB is far
    beyond any TPU VMEM, so the steps genuinely stream HBM (a 64 MiB carry
    measured 4.7 TB/s — it never left on-chip memory)."""
    n = 64 * 1024 * 1024  # 256 MiB of f32
    x0 = jnp.ones((n // 128, 128), jnp.float32)
    s = jnp.full((1, 128), 1.0000001, jnp.float32)

    @functools.partial(jax.jit, static_argnames=("r",))
    def chain(x, s, r):
        y, _ = jax.lax.scan(lambda c, _: (c * s, None), x, None, length=r)
        return y[0].sum()

    sec = _amortized_raw(lambda r: chain(x0, s, r), r_lo=4, r_hi=64)
    return 2.0 * n * 4 / sec  # read + write


def _amortized_raw(make, r_lo, r_hi, reps=5):
    """Chain-length slope on a prebuilt jitted callable of r."""

    def timed(r):
        float(np.asarray(make(r)))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(np.asarray(make(r)))
            ts.append(time.perf_counter() - t0)
        return min(ts)  # capability estimator (see module docstring)

    return max(timed(r_hi) - timed(r_lo), 1e-12) / (r_hi - r_lo)


# jaxpr primitives that retire as VPU arithmetic; everything else
# (broadcasts, converts, reshapes, slices) is layout plumbing that Mosaic
# largely folds away — counting it inflated the round-2 "roof" by ~8%.
_ARITH_PRIMS = {
    "add", "sub", "mul", "div", "rem", "max", "min", "neg", "abs", "sign",
    "floor", "ceil", "round", "sqrt", "rsqrt", "exp", "log", "log1p",
    "expm1", "sin", "cos", "tan", "tanh", "logistic", "pow", "integer_pow",
    "atan2", "erf", "clamp", "select_n", "gt", "lt", "ge", "le", "eq", "ne",
    "and", "or", "not", "xor", "is_finite", "square", "cbrt",
    "reduce_sum", "reduce_max", "reduce_min", "reduce_prod",
    "reduce_and", "reduce_or",
}


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
    n_arith = sum(
        1 for e in jaxpr.jaxpr.eqns if e.primitive.name in _ARITH_PRIMS
    )
    ops["vector_ops_per_substep"] = n_ops
    ops["arith_ops_per_substep"] = n_arith
    ops["flops_per_sample_substep"] = float(n_arith)  # ~1 flop/op/sample
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

    sec, sec_attempts = _amortized(
        lambda acc: one(jax.random.PRNGKey(1), acc), (),
        attempts=3, settle_s=5.0, return_attempts=True,
    )
    counts = count_fused_ops(env.model, n_substeps)
    substeps_total = (hsample + 1) * n_substeps
    # each arith eqn = one (8,128)-tile op per 1024 samples
    tile_ops = (
        counts["arith_ops_per_substep"] * substeps_total * (B / (8 * 128))
    )
    microbench_peak = vpu_peak_eqn_ops_per_sec()
    # self-consistency: a VPU program cannot retire eqn-ops faster than the
    # hardware peak, so an observed kernel rate above the microbench's
    # measured peak is direct evidence the microbench hit interference —
    # raise the roof to the observed rate (module docstring).  This keeps
    # fraction_of_roof <= 1.0 by physics, not tuning.
    peak = max(microbench_peak, tile_ops / sec)
    compute_sec = tile_ops / peak
    # memory bound: stream controls in, rewards out (state stays in VMEM)
    bytes_moved = B * (hsample + 1) * (env.action_size + 1) * 4
    bw = hbm_copy_bytes_per_sec()
    memory_sec = bytes_moved / bw
    ideal_sec = max(compute_sec, memory_sec)
    return {
        "task": task,
        "nsample": nsample,
        "n_substeps": n_substeps,
        "measured_ms": 1e3 * sec,
        # every attempt's slope (ms): the run-to-run spread on the
        # time-shared tile, published so a single BENCH row is auditable
        "measured_ms_attempts": [1e3 * s for s in sec_attempts],
        "vector_ops_per_substep": counts["vector_ops_per_substep"],
        "arith_ops_per_substep": counts["arith_ops_per_substep"],
        "measured_peak_gops": peak / 1e9,
        "microbench_peak_gops": microbench_peak / 1e9,
        "roof_raised_by_kernel_evidence": bool(peak > microbench_peak),
        "measured_hbm_gbps": bw / 1e9,
        "ideal_compute_ms": 1e3 * compute_sec,
        "ideal_memory_ms": 1e3 * memory_sec,
        "bound": "compute" if compute_sec >= memory_sec else "memory",
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
