"""Benchmark harness — prints ONE JSON line with the headline metric.

Headline: wall-clock per DIAL-MPC annealing iteration (`reverse_once`: sample
noise → spline-expand → 2049 batched physics rollouts × 21 steps → collective
softmax update) on Go2 at Nsample=2048, Hsample=20 — the north-star workload
(BASELINE.json: <10 ms/iteration per TPU v5e chip).

`vs_baseline` = north-star budget (10 ms) / measured ms, so >1.0 beats the
target.  The reference C++ publishes no numbers (BASELINE.md); its workload
(42.6M sequential mj_step calls per 400-step run, SURVEY §6) is the qualitative
anchor.
"""

import json
import time

NORTH_STAR_MS = 10.0


def run_bench(task="go2_stand", nsample=2048, hsample=20, hnode=5, iters=20):
    import jax
    import jax.numpy as jnp

    from tpu_dialmpc.envs import get_env
    from tpu_dialmpc.planner.dial import DialConfig, MBDPI

    env = get_env(task, n_substeps=8)
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
    key = jax.random.PRNGKey(1)

    fn = jax.jit(mbdpi.reverse_once)
    # warmup / compile
    out = fn(state, key, Y0, scale)
    jax.block_until_ready(out[0])

    times = []
    for i in range(iters):
        key, k = jax.random.split(key)
        t0 = time.perf_counter()
        out = fn(state, k, out[0], scale)
        jax.block_until_ready(out[0])
        times.append(time.perf_counter() - t0)
    times.sort()
    med_ms = 1000.0 * times[len(times) // 2]
    return {
        "metric": f"{task}_reverse_once_ms_N{nsample}_H{hsample}",
        "value": round(med_ms, 3),
        "unit": "ms/iteration",
        "vs_baseline": round(NORTH_STAR_MS / med_ms, 3),
    }


if __name__ == "__main__":
    print(json.dumps(run_bench()))
