"""Benchmark harness — prints ONE JSON line with the headline metric.

Headline: wall-clock per DIAL-MPC annealing iteration (`reverse_once`: sample
noise → spline-expand → 2049 batched physics rollouts × 21 steps × 8 substeps
→ collective softmax update) on Go2 at Nsample=2048, Hsample=20 — the
north-star workload (BASELINE.json: <10 ms/iteration per TPU v5e chip).

Measurement: iterations are chained inside one jitted `lax.scan` (exactly how
the receding-horizon runner executes them) and timed end-to-end including the
device→host readback; per-iteration time is the slope between a short and a
long chain, which removes the fixed host↔device round-trip latency (~25 ms on
a tunneled TPU) that would otherwise dominate and is not part of steady-state
control-loop throughput.

`vs_baseline` = north-star budget (10 ms) / measured ms, so >1.0 beats the
target.  The reference C++ publishes no numbers (BASELINE.md); its workload
(42.6M sequential mj_step calls per 400-step run, SURVEY §6) is the
qualitative anchor.
"""

import functools
import json
import time

NORTH_STAR_MS = 10.0


def run_bench(task="go2_stand", nsample=2048, hsample=20, hnode=5, iters=6,
              n_substeps=8):
    import jax
    import jax.numpy as jnp
    import numpy as np

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
    state = env.reset(jax.random.PRNGKey(0))
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

    def timed(r):
        # compile + warm
        float(np.asarray(chain(state, Y0, jax.random.PRNGKey(1), r)))
        ts = []
        for i in range(iters):
            t0 = time.perf_counter()
            float(np.asarray(chain(state, Y0, jax.random.PRNGKey(2 + i), r)))
            ts.append(time.perf_counter() - t0)
        ts.sort()
        return ts[len(ts) // 2]

    r_lo, r_hi = 2, 18
    t_lo, t_hi = timed(r_lo), timed(r_hi)
    med_ms = 1000.0 * max(t_hi - t_lo, 1e-9) / (r_hi - r_lo)
    return {
        "metric": f"{task}_reverse_once_ms_N{nsample}_H{hsample}_sub{n_substeps}",
        "value": round(med_ms, 3),
        "unit": "ms/iteration",
        "vs_baseline": round(NORTH_STAR_MS / med_ms, 3),
    }


if __name__ == "__main__":
    print(json.dumps(run_bench()))
