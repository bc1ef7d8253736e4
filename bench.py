"""Benchmark harness — prints ONE JSON line with the headline metric.

Headline: wall-clock per DIAL-MPC annealing iteration (`reverse_once`: sample
noise → spline-expand → 2049 batched physics rollouts × 21 steps × 8 substeps
→ collective softmax update) on Go2 at Nsample=2048, Hsample=20 — the
north-star workload (BASELINE.json: <10 ms/iteration per TPU v5e chip).

The `extra` field carries the secondary metrics (same schema):
  - full control-step latency: env.step + receding-horizon shift + 2
    annealing iterations — the real-time unit of the application
    (dial-core-test.cpp:64-99); its budget is ctrl_dt = 20 ms.
  - the Nsample=16384 scaling row (8× the reference batch on one chip).
  - achieved fraction of the VPU roofline for the fused rollout kernel.

Measurement: iterations are chained inside one jitted `lax.scan` (exactly how
the receding-horizon runner executes them) and timed end-to-end including the
device→host readback; per-iteration time is the slope between a short and a
long chain, which removes the fixed host↔device round-trip latency (~25 ms on
a tunneled TPU) that would otherwise dominate and is not part of steady-state
control-loop throughput.

`vs_baseline` = budget / measured, so >1.0 beats the target.  The reference
C++ publishes no numbers (BASELINE.md); its workload (42.6M sequential
mj_step calls per 400-step run, SURVEY §6) is the qualitative anchor.

Metric-name convention: `H20` in a metric name is DialConfig.Hsample=20,
i.e. 21 dense control points per rollout (Hsample+1) — kept stable across
rounds for comparability.
"""

import functools
import json
import time

NORTH_STAR_MS = 10.0
CTRL_DT_MS = 20.0  # real-time budget of one control step (ctrl_dt=0.02)


def _chain_slope_ms(timed, r_lo=2, r_hi=18):
    t_lo, t_hi = timed(r_lo), timed(r_hi)
    return 1000.0 * max(t_hi - t_lo, 1e-9) / (r_hi - r_lo)


def _timed_factory(chain, args, iters):
    import numpy as np

    def timed(r):
        # compile + warm
        float(np.asarray(chain(*args, r)))
        ts = []
        for i in range(iters):
            t0 = time.perf_counter()
            float(np.asarray(chain(*args, r)))
            ts.append(time.perf_counter() - t0)
        ts.sort()
        return ts[len(ts) // 2]

    return timed


def run_bench(task="go2_stand", nsample=2048, hsample=20, hnode=5, iters=6,
              n_substeps=8):
    """Headline: ms per reverse_once iteration."""
    import jax
    import jax.numpy as jnp

    from tpu_dialmpc.envs import get_env
    from tpu_dialmpc.planner.dial import DialConfig, MBDPI

    env = get_env(task, n_substeps=n_substeps)
    cfg = DialConfig(
        Hsample=hsample,
        Hnode=hnode,
        Nsample=nsample,
        Ndiffuse=2,
        temp_sample=0.05,
        horizon_diffuse_factor=0.9,
        ctrl_dt=0.02,
    )
    mbdpi = MBDPI(cfg, env)
    # jitted reset: eager dispatch would compile dozens of tiny programs,
    # each a server round-trip on a tunneled backend
    state = jax.jit(env.reset)(jax.random.PRNGKey(0))
    Y0 = jnp.zeros((cfg.Hnode + 1, env.action_size))
    scale = jnp.asarray(mbdpi.sigma_control, Y0.dtype)

    @functools.partial(jax.jit, static_argnames=("r",))
    def chain(state, y0, key, r):
        def body(y, k):
            y2, info = mbdpi.reverse_once(state, k, y, scale)
            return y2, info.rew_Ybar

        keys = jax.random.split(key, r)
        y, rews = jax.lax.scan(body, y0, keys)
        return y.sum() + rews.sum()

    timed = _timed_factory(chain, (state, Y0, jax.random.PRNGKey(1)), iters)
    med_ms = _chain_slope_ms(timed)
    # the north-star budget is defined at Nsample=2048, Hsample=20 (Go2);
    # other shapes carry proportionally more work, so their budget scales
    # per-sample and per-horizon-step (the 16384-sample row is 8x the
    # workload, not the same workload slower).  For non-go2 tasks the
    # scaled budget still assumes go2 per-substep cost, so vs_baseline is
    # a cross-model comparison, not a same-model budget.
    budget_ms = NORTH_STAR_MS * (nsample / 2048.0) * ((hsample + 1) / 21.0)
    return {
        "metric": f"{task}_reverse_once_ms_N{nsample}_H{hsample}_sub{n_substeps}",
        "value": round(med_ms, 3),
        "unit": "ms/iteration",
        "vs_baseline": round(budget_ms / med_ms, 3),
    }


def run_control_step_bench(task="go2_stand", nsample=2048, hsample=20,
                           hnode=5, iters=6, n_substeps=8, n_diffuse=2):
    """Full control step: env.step + shift + n_diffuse annealing iterations
    (the dial-core-test.cpp:64-99 loop body) chained on device."""
    import jax
    import jax.numpy as jnp

    from tpu_dialmpc.envs import get_env
    from tpu_dialmpc.planner.dial import DialConfig, MBDPI

    from tpu_dialmpc.envs.base import to_lean
    from tpu_dialmpc.planner.runner import _lean_capable

    env = get_env(task, n_substeps=n_substeps)
    cfg = DialConfig(
        Hsample=hsample, Hnode=hnode, Nsample=nsample, Ndiffuse=n_diffuse,
        temp_sample=0.05, horizon_diffuse_factor=0.9, ctrl_dt=0.02,
    )
    mbdpi = MBDPI(cfg, env)
    lean = _lean_capable(env)
    state = jax.jit(env.reset)(jax.random.PRNGKey(0))  # see run_bench
    if lean:
        state = to_lean(state)
    Y0 = jnp.zeros((cfg.Hnode + 1, env.action_size))

    @functools.partial(jax.jit, static_argnames=("r",))
    def chain(state, y0, key, r):
        def body(carry, k):
            st, y = carry
            st2 = env.step_lean(st, y[0]) if lean else env.step(st, y[0])
            y1 = mbdpi.shift(y)
            y2, infos = mbdpi.improve(st2, y1, k, n_diffuse)
            return (st2, y2), infos.rew_Ybar[-1]

        keys = jax.random.split(key, r)
        (st, y), rews = jax.lax.scan(body, (state, y0), keys)
        return y.sum() + rews.sum() + st.reward

    timed = _timed_factory(chain, (state, Y0, jax.random.PRNGKey(1)), iters)
    med_ms = _chain_slope_ms(timed, r_lo=2, r_hi=10)
    return {
        "metric": (
            f"{task}_control_step_ms_N{nsample}_H{hsample}"
            f"_sub{n_substeps}_d{n_diffuse}"
        ),
        "value": round(med_ms, 3),
        "unit": "ms/control-step",
        "vs_baseline": round(CTRL_DT_MS / med_ms, 3),
    }


def run_roofline(task="go2_stand", nsample=2048, hsample=20, n_substeps=8):
    from tpu_dialmpc.telemetry.profile import fused_kernel_roofline

    roof = fused_kernel_roofline(
        task=task, nsample=nsample, n_substeps=n_substeps, hsample=hsample
    )
    frac = roof["fraction_of_roof"]
    attempts_ms = sorted(roof["measured_ms_attempts"])
    med_ms = attempts_ms[len(attempts_ms) // 2]
    return {
        "metric": f"{task}_fused_rollout_vpu_roofline_N{nsample}",
        "value": round(frac, 3),
        "unit": "fraction_of_vpu_roof",
        "vs_baseline": round(frac, 3),  # target = 1.0 (speed of light)
        # roof provenance: independent microbenchmarks, not kernel-tuned
        # constants (telemetry/profile.py module docstring).  The post-raise
        # roof (measured_peak_gops) is published NEXT TO the raw microbench
        # roof and the raised? flag so a capped fraction ~1.0 is
        # distinguishable from a genuine speed-of-light kernel, and the
        # per-attempt spread makes the single-sample row auditable.
        "measured_peak_gops": round(roof["measured_peak_gops"], 2),
        "microbench_peak_gops": round(roof["microbench_peak_gops"], 2),
        "roof_raised_by_kernel_evidence": roof["roof_raised_by_kernel_evidence"],
        "measured_hbm_gbps": round(roof["measured_hbm_gbps"], 1),
        "bound": roof["bound"],
        "ideal_ms": round(roof["ideal_vpu_ms"], 3),
        "measured_ms": round(roof["measured_ms"], 3),
        "measured_ms_attempts": [round(s, 3) for s in attempts_ms],
        # fraction at the median attempt (the min is the capability
        # estimate; the median shows what a typical window would report)
        "fraction_at_median_attempt": round(
            frac * roof["measured_ms"] / med_ms, 3
        ),
    }


def _child_env() -> dict:
    """Environment for bench subprocesses (probe + measurement child).

    When the run is pinned to CPU (JAX_PLATFORMS / TPU_DIALMPC_PLATFORM),
    drop PALLAS_AXON_POOL_IPS so the axon sitecustomize skips TPU-plugin
    registration in the child: that registration dials the tunnel relay and
    costs ~110 s of pure waiting per interpreter — paid even by processes
    that will never touch the TPU.
    """
    import os

    env = dict(os.environ)
    pinned_cpu = (
        env.get("JAX_PLATFORMS") == "cpu"
        or env.get("TPU_DIALMPC_PLATFORM") == "cpu"
    )
    if pinned_cpu:
        env.pop("PALLAS_AXON_POOL_IPS", None)
    return env


def _backend_probe_ok(timeout_s: float | None = None) -> bool:
    """Probe JAX backend init in a subprocess with a hard timeout.

    A tunneled-TPU claim can block indefinitely inside make_c_api_client
    when the tile is wedged (e.g. a previous holder died mid-session); an
    in-process hang would leave no bench artifact at all.  The subprocess
    is killed as a group on timeout so no waiter lingers.

    `TPU_DIALMPC_BENCH_PROBE_TIMEOUT` overrides the 480 s default (tests
    exercise the wedged path with a short one; measured healthy-but-slow
    tunnel init on 2026-08-20 was ~280 s, which a 240 s probe misread as
    wedged — the default needs headroom over the slowest healthy init).
    """
    import os
    import signal
    import subprocess
    import sys

    if timeout_s is None:
        timeout_s = float(
            os.environ.get("TPU_DIALMPC_BENCH_PROBE_TIMEOUT", "480")
        )

    p = subprocess.Popen(
        [
            sys.executable,
            "-c",
            "import jax, jax.numpy as jnp; "
            "assert float(jnp.ones(2).sum()) == 2.0",
        ],
        start_new_session=True,
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
        env=_child_env(),
    )
    try:
        return p.wait(timeout=timeout_s) == 0
    except subprocess.TimeoutExpired:
        os.killpg(p.pid, signal.SIGKILL)
        return False


def _backend_probe_with_retry() -> tuple[bool, int]:
    """Bounded probe retries: (ok, attempts_used).

    Round 4 shipped no fresh perf number because ONE hung tunnel claim
    failed the single probe and the whole round fell back to the cached
    measurement (BENCH_r04.json).  A wedged claim is often transient — the
    pool re-grants after the dead holder's claim expires — so the probe now
    makes up to `TPU_DIALMPC_BENCH_PROBE_ATTEMPTS` (default 3) attempts
    with a cooldown between them.  Per docs/OPERATIONS.md ("keep recovery
    probes few and LONG-LIVED"), each attempt keeps the full generous
    timeout; the cooldown (default min(60 s, probe timeout), override
    `TPU_DIALMPC_BENCH_PROBE_COOLDOWN`) gives the pool a grant cycle
    between attempts instead of hammering it.
    """
    import os

    timeout_s = float(
        os.environ.get("TPU_DIALMPC_BENCH_PROBE_TIMEOUT", "480")
    )
    attempts = max(
        1, int(os.environ.get("TPU_DIALMPC_BENCH_PROBE_ATTEMPTS", "3"))
    )
    cooldown_s = float(
        os.environ.get(
            "TPU_DIALMPC_BENCH_PROBE_COOLDOWN", str(min(60.0, timeout_s))
        )
    )
    for i in range(1, attempts + 1):
        if _backend_probe_ok(timeout_s):
            return True, i
        if i < attempts:
            time.sleep(cooldown_s)
    return False, attempts


def _measure_all():
    """The full measurement suite (headline + extras); runs in the child."""
    headline = run_bench()
    extra = []
    for fn in (
        lambda: run_control_step_bench(),
        lambda: run_bench(nsample=16384, iters=4),
        # H1 whole-body on the chip (round-4 audit: config #5's H1 compute
        # was proxied by a go2 number; these rows measure it).  N=2048/H=32
        # is the reference-batch H1 row; N=8192 is config #5's per-chip
        # share (131072 samples / 16 chips, configs/h1_multihost.yaml) and
        # feeds quality.py:_predicted_efficiency directly.
        lambda: run_bench(task="h1_push_crate", nsample=2048, hsample=32,
                          hnode=8, iters=4),
        lambda: run_bench(task="h1_push_crate", nsample=8192, hsample=32,
                          hnode=8, iters=3),
        lambda: run_roofline(),
    ):
        try:
            extra.append(fn())
        except Exception as e:  # CPU-only hosts: fused/roofline unavailable
            extra.append({"metric": "skipped", "error": str(e)[:200]})
    headline["extra"] = extra
    headline["measured_at"] = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
    try:
        import jax

        headline["platform"] = jax.default_backend()
    except Exception:
        pass
    return headline


def _emit_wedged(reason: str, last_good_path: str):
    out = {
        "metric": "go2_stand_reverse_once_ms_N2048_H20_sub8",
        "value": -1.0,
        "unit": "ms/iteration",
        "vs_baseline": 0.0,
        "error": reason,
    }
    try:
        with open(last_good_path) as f:
            out["last_known_good"] = json.load(f)
    except Exception:
        pass
    print(json.dumps(out))
    raise SystemExit(0)


if __name__ == "__main__":
    import os
    import signal
    import subprocess
    import sys

    # every successful run is cached here so a later wedged-tunnel run can
    # still report the most recent real measurement instead of nothing
    _last_good_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_LAST_GOOD.json"
    )
    if "--child" in sys.argv:
        # measurement worker: parent owns the watchdog + fallback
        print(json.dumps(_measure_all()))
        sys.exit(0)
    # TPU_DIALMPC_BENCH_SKIP_PROBE=1: go straight to the (watchdogged)
    # measurement child.  For supervisors that have JUST verified the
    # backend themselves — every extra probe is an extra tunnel claim, and
    # a probe killed at timeout can itself wedge the tile
    # (docs/OPERATIONS.md "wedged-tile behavior").
    if os.environ.get("TPU_DIALMPC_BENCH_SKIP_PROBE") == "1":
        _probe_ok, _probe_attempts = True, 0
    else:
        _probe_ok, _probe_attempts = _backend_probe_with_retry()
    if not _probe_ok:
        _emit_wedged(
            f"backend init hung on all {_probe_attempts} probe attempts "
            "(wedged TPU tunnel claim) — no measurement possible this run",
            _last_good_path,
        )
    # The probe only proves backend *init*; a degraded tunnel can still stall
    # per-program XLA compiles server-side (observed: >90 s for a single
    # eager concatenate after a clean init).  Run the whole measurement in a
    # killable subprocess so bench.py always emits a JSON line.  A failed or
    # stalled measurement gets ONE fresh-subprocess retry (a new interpreter
    # makes a new tunnel claim; round-4 postmortem: single-shot measurement
    # zeroed the round's perf evidence).
    # 45 min default: the suite gained two H1 compile-heavy rows in round 5
    _budget_s = float(os.environ.get("TPU_DIALMPC_BENCH_TIMEOUT", "2700"))
    _meas_attempts = max(
        1, int(os.environ.get("TPU_DIALMPC_BENCH_MEASURE_ATTEMPTS", "2"))
    )
    lines, last_err = [], "unknown"
    for _attempt in range(1, _meas_attempts + 1):
        p = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--child"],
            start_new_session=True,
            stdout=subprocess.PIPE,
            text=True,
            env=_child_env(),
        )
        try:
            stdout, _ = p.communicate(timeout=_budget_s)
        except subprocess.TimeoutExpired:
            os.killpg(p.pid, signal.SIGKILL)
            p.wait()
            last_err = (
                f"measurement exceeded {_budget_s:.0f}s (degraded tunnel: "
                "backend up but per-program compiles stalling)"
            )
            continue
        lines = [l for l in (stdout or "").strip().splitlines() if l.strip()]
        if p.returncode == 0 and lines:
            break
        last_err = f"measurement subprocess failed (rc={p.returncode})"
        lines = []
    if not lines:
        _emit_wedged(
            f"{last_err} — after {_meas_attempts} attempts, no fresh "
            "measurement this run",
            _last_good_path,
        )
    headline = json.loads(lines[-1])
    headline["probe_attempts"] = _probe_attempts
    # only a real-TPU measurement is worth caching as "last good"
    if headline.get("platform") not in (None, "cpu"):
        with open(_last_good_path, "w") as f:
            json.dump(headline, f, indent=1)
    print(json.dumps(headline))
