"""Structural checks on the quality-gate definitions (fast lane).

The gates themselves are TPU-only e2e runs (tests/test_quality_tpu.py);
these checks keep the definitions sound without hardware: every gate has a
quick audit lane, the quick lane reuses the full lane's metrics, and
termination/posture thresholds are not silently loosened in quick mode.
"""

from tpu_dialmpc.quality import GATES


def test_every_gate_has_quick_lane():
    for name, g in GATES.items():
        assert g.quick_checks, f"{name} has no quick_checks"
        assert 0 < g.quick_n_steps < g.n_steps


def test_quick_lane_metrics_subset_of_full():
    for name, g in GATES.items():
        full = {c[0] for c in g.checks}
        quick = {c[0] for c in g.quick_checks}
        # quick may drop count/distance checks but must not invent metrics
        assert quick <= full, f"{name}: quick metrics {quick - full} not in full"


def test_quick_lane_does_not_loosen_safety_thresholds():
    # posture (z_min) and termination-rate thresholds are horizon-free:
    # quick mode must keep them at least as strict as the full gate.
    safety = ("z_min", "dones_mean", "dones_height_mean",
              "dones_inverted_mean", "z_last100_mean")
    for name, g in GATES.items():
        full = {c[0]: (c[1], c[2]) for c in g.checks}
        for metric, op, thr in g.quick_checks:
            if metric not in safety or metric not in full:
                continue
            fop, fthr = full[metric]
            assert op == fop, f"{name}.{metric}: op flipped in quick lane"
            if op == ">":
                assert thr >= fthr, f"{name}.{metric} loosened in quick lane"
            else:
                assert thr <= fthr, f"{name}.{metric} loosened in quick lane"
