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


def test_predicted_efficiency_rows_formula():
    """eff = compute/(compute + 2*ceil(log2 N)*L + 2*payload/BW); N=1 has no
    inter-host hop so efficiency is bandwidth-only (~1.0 for tiny payloads)."""
    from tpu_dialmpc.shard.scaling import predicted_efficiency_rows

    rows = predicted_efficiency_rows(
        compute_ms=2.5, payload_bytes=320,
        n_hosts_list=(1, 2, 4), latency_us_list=(100.0,), dcn_gbps=25.0,
    )
    assert [r["n_hosts"] for r in rows] == [1, 2, 4]
    bw_ms = 2 * 320 / 25e9 * 1e3
    assert abs(rows[0]["collective_ms"] - bw_ms) < 5e-5  # rounded to 4 dp
    assert abs(rows[1]["collective_ms"] - (0.2 + bw_ms)) < 5e-5
    assert abs(rows[2]["collective_ms"] - (0.4 + bw_ms)) < 5e-5
    want = 2.5 / (2.5 + 0.4 + bw_ms)
    assert abs(rows[2]["predicted_efficiency"] - round(want, 4)) < 1e-12
    # monotone: more hosts -> more hops -> lower efficiency
    effs = [r["predicted_efficiency"] for r in rows]
    assert effs == sorted(effs, reverse=True)


def test_collective_overhead_report_structure():
    """Sharded-vs-unsharded at identical total workload on the virtual mesh:
    both timings positive, payload matches (Hnode+1)*nu*4 + scalar psums."""
    from tpu_dialmpc.shard.scaling import collective_overhead_report

    row = collective_overhead_report(
        nsample=64, hsample=6, hnode=2, n_devices=8,
        env=StubFusedEnv(fused=False),
    )
    assert row["unsharded_ms"] > 0 and row["sharded_ms"] > 0
    assert row["payload_bytes_per_iteration"] == 3 * 4 * 4 + 32
    assert row["n_devices_virtual"] == 8
    assert abs(
        row["overhead_ms"] - (row["sharded_ms"] - row["unsharded_ms"])
    ) < 1e-9
