"""run_scan chunking: chunked execution must be step-for-step identical to
the monolithic scan (same key-split sequence, same trajectories).

Why chunking exists: a monolithic 600-step scan at Nsample=8192 is a
multi-minute single XLA execution and the tunneled-TPU service watchdog
kills the worker mid-run (reproduced twice; the raw fused kernel and a
single reverse_once at the same batch are fine).  planner/runner.py
auto-chunks above RUN_SCAN_SAMPLE_SUBSTEP_BUDGET.
"""

import numpy as np

from tpu_dialmpc.envs import get_env
from tpu_dialmpc.planner import runner
from tpu_dialmpc.planner.dial import DialConfig


def _cfg(n_steps):
    return DialConfig(
        Hsample=5, Hnode=2, Nsample=8, Ndiffuse=1, Ndiffuse_init=2,
        ctrl_dt=0.02, n_steps=n_steps,
    )


def test_chunked_equals_monolithic():
    env = get_env("go2_stand", n_substeps=2)
    mono = runner.run_scan(env, _cfg(7), chunk=7)
    chunked = runner.run_scan(env, _cfg(7), chunk=3)  # 3 + 3 + 1
    np.testing.assert_array_equal(
        np.asarray(mono.qpos), np.asarray(chunked.qpos)
    )
    np.testing.assert_array_equal(
        np.asarray(mono.rewards), np.asarray(chunked.rewards)
    )
    np.testing.assert_array_equal(np.asarray(mono.us), np.asarray(chunked.us))
    np.testing.assert_array_equal(
        np.asarray(mono.final_Y0), np.asarray(chunked.final_Y0)
    )


def test_auto_chunk_policy():
    """Gate/bench workloads stay monolithic; watchdog-scale workloads get
    a bounded chunk."""
    env = get_env("go2_stand", n_substeps=8)
    budget = runner.RUN_SCAN_SAMPLE_SUBSTEP_BUDGET
    # the validated gate shapes stay monolithic, incl. the largest
    # (crate-climb: 600 steps x 2049 x 26 x 8 x 2 ~ 5.1e8)
    per_step_gate = 2049 * 26 * 8 * 2
    assert per_step_gate * 600 <= budget
    # the crashing shape: 600 x 8193 x 26 x 8 x 2 ~ 2.0e9 > budget
    per_step_crash = 8193 * 26 * 8 * 2
    assert per_step_crash * 600 > budget
    assert int(budget // per_step_crash) >= 100  # chunks stay useful
