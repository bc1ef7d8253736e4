"""Telemetry stream + native C++ sink tests."""

import json
import time

import pytest

from tpu_dialmpc.telemetry import TelemetryStream


def test_python_stream_writes_jsonl(tmp_path):
    path = str(tmp_path / "t.jsonl")
    with TelemetryStream(path, backend="python") as s:
        for i in range(5):
            s.emit({"t": i, "v": i * 2.0})
        time.sleep(0.3)
    lines = [json.loads(l) for l in open(path)]
    assert [r["t"] for r in lines] == list(range(5))


def test_native_sink_roundtrip(tmp_path):
    from tpu_dialmpc.native import load_telemetry_sink

    if load_telemetry_sink() is None:
        pytest.skip("no C++ toolchain")
    path = str(tmp_path / "n.jsonl")
    with TelemetryStream(path, backend="native") as s:
        for i in range(20):
            s.emit({"t": i})
        time.sleep(0.5)
    lines = [json.loads(l) for l in open(path)]
    assert [r["t"] for r in lines] == list(range(20))


def test_stream_drops_rather_than_blocks(tmp_path):
    s = TelemetryStream(str(tmp_path / "d.jsonl"), maxsize=2, backend="python")
    for i in range(1000):
        s.emit({"t": i})  # must never block the control loop
    s.close()
