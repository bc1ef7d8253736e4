"""Smoke test for the scaling-efficiency harness (shard/scaling.py).

Runs the real harness (ShardedMBDPI + chain-slope timing) over 1/2/4-device
CPU meshes with the stub fused env — validating the mesh construction,
sharded compile, and report arithmetic that the north-star scaling report
uses, without the cost of real physics on CPU."""

import numpy as np

from tpu_dialmpc.shard.scaling import scaling_report

from stub_env import StubFusedEnv


def test_scaling_report_smoke():
    rows = scaling_report(
        nsample=32,
        hsample=6,
        hnode=2,
        mesh_sizes=[1, 2, 4],
        env=StubFusedEnv(),
    )
    assert [r["devices"] for r in rows] == [1, 2, 4]
    for r in rows:
        assert r["ms_per_iteration"] > 0
        assert np.isfinite(r["iterations_per_sec"])
        assert r["nsample"] == 32
    assert rows[0]["efficiency_vs_linear"] == 1.0
