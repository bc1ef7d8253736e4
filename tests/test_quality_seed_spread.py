"""Unit tests for quality.py's multi-seed spread/sensitivity summary
(round-4 audit: single-seed gates can hide threshold fragility)."""

import importlib.util
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load():
    spec = importlib.util.spec_from_file_location(
        "quality_root", os.path.join(REPO, "quality.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _gate(seed, z_min, passed):
    return {
        "gate": "g",
        "seed": seed,
        "metrics": {"z_min": z_min, "note_str": "x"},
        "checks": [
            {"metric": "z_min", "op": ">", "threshold": 0.15,
             "measured": z_min, "passed": passed}
        ],
        "passed": passed,
    }


def test_seed_spread_and_sensitivity():
    q = _load()
    results = [_gate(0, 0.20, True), _gate(7, 0.14, False)]
    spread, sensitive = q._seed_spread(results)
    assert spread["g"]["z_min"]["min"] == 0.14
    assert spread["g"]["z_min"]["max"] == 0.20
    assert spread["g"]["z_min"]["by_seed"] == {"0": 0.2, "7": 0.14}
    # pass under seed 0, fail under seed 7 -> flagged seed-sensitive
    assert sensitive == [
        {"gate": "g", "metric": "z_min",
         "passed_by_seed": {"0": True, "7": False}}
    ]


def test_seed_spread_stable_check_not_flagged():
    q = _load()
    spread, sensitive = q._seed_spread(
        [_gate(0, 0.20, True), _gate(7, 0.21, True)]
    )
    assert sensitive == []
    assert spread["g"]["z_min"]["min"] == 0.20


def test_single_seed_produces_no_spread():
    q = _load()
    spread, sensitive = q._seed_spread([_gate(0, 0.2, True)])
    assert spread == {} and sensitive == []
