"""bench.py wedged-backend fallback: still emits a JSON line with the
last-known-good measurement instead of hanging or printing nothing.

The tunneled-TPU claim can wedge server-side (axon init blocks or raises
UNAVAILABLE); the driver runs bench.py unconditionally at round end, so the
degraded path is a real production surface.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_measurement_timeout_reports_last_known_good():
    """Degraded-tunnel shape #2: backend init succeeds (probe passes) but
    per-program compiles stall — the measurement watchdog must still emit a
    JSON line with the cached measurement (observed in production: a clean
    init followed by >90 s server-side compiles of single eager ops)."""
    env = dict(os.environ)
    # pin the probe subprocess to CPU: if another process holds the single
    # tunneled TPU claim (e.g. the quality harness), a TPU-path probe hangs
    # and this test would exercise the wrong fallback shape
    env["JAX_PLATFORMS"] = "cpu"
    env["TPU_DIALMPC_PLATFORM"] = "cpu"
    # skip axon TPU-plugin registration in every spawned interpreter: it
    # dials the tunnel relay (~110 s of waiting per process) and this test
    # exercises bench.py's watchdog logic, not the tunnel
    env.pop("PALLAS_AXON_POOL_IPS", None)
    # generous probe budget in case of external load on this 1-core box
    env["TPU_DIALMPC_BENCH_PROBE_TIMEOUT"] = "120"  # probe passes (CPU jax)
    env["TPU_DIALMPC_BENCH_TIMEOUT"] = "1"  # child can never finish in 1 s
    out = subprocess.run(
        [sys.executable, "bench.py"],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    line = json.loads(out.stdout.strip().splitlines()[-1])
    assert line["value"] == -1.0 and "measurement exceeded" in line["error"]
    lkg = line["last_known_good"]
    assert lkg["unit"] == "ms/iteration" and lkg["value"] > 0


def test_child_env_strips_axon_registration_only_when_cpu_pinned(monkeypatch):
    """bench subprocesses must skip the axon TPU-plugin registration (a
    ~110 s relay dial per interpreter) when the run is CPU-pinned, and must
    NOT strip it for a production TPU run."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench_mod", os.path.join(REPO, "bench.py")
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "10.0.0.1")
    monkeypatch.delenv("JAX_PLATFORMS", raising=False)
    monkeypatch.delenv("TPU_DIALMPC_PLATFORM", raising=False)
    assert "PALLAS_AXON_POOL_IPS" in bench._child_env()  # TPU run: keep

    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    assert "PALLAS_AXON_POOL_IPS" not in bench._child_env()

    monkeypatch.delenv("JAX_PLATFORMS", raising=False)
    monkeypatch.setenv("TPU_DIALMPC_PLATFORM", "cpu")
    assert "PALLAS_AXON_POOL_IPS" not in bench._child_env()


def _load_bench_module():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench_mod_retry", os.path.join(REPO, "bench.py")
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    return bench


def test_probe_retry_recovers_from_transient_wedge(monkeypatch):
    """Round-4 postmortem: ONE hung tunnel claim zeroed the round's perf
    evidence.  The probe must retry (with cooldown) so a transient wedge —
    the pool re-grants after the dead holder's claim expires — doesn't
    abort measurement."""
    bench = _load_bench_module()
    monkeypatch.setenv("TPU_DIALMPC_BENCH_PROBE_ATTEMPTS", "3")
    monkeypatch.setenv("TPU_DIALMPC_BENCH_PROBE_COOLDOWN", "0")

    calls = []

    def fake_probe(timeout_s=None):
        calls.append(timeout_s)
        return len(calls) >= 2  # first attempt wedged, second recovers

    monkeypatch.setattr(bench, "_backend_probe_ok", fake_probe)
    ok, attempts = bench._backend_probe_with_retry()
    assert ok and attempts == 2 and len(calls) == 2


def test_probe_retry_bounded(monkeypatch):
    bench = _load_bench_module()
    monkeypatch.setenv("TPU_DIALMPC_BENCH_PROBE_ATTEMPTS", "2")
    monkeypatch.setenv("TPU_DIALMPC_BENCH_PROBE_COOLDOWN", "0")
    calls = []
    monkeypatch.setattr(
        bench, "_backend_probe_ok",
        lambda timeout_s=None: (calls.append(1), False)[1],
    )
    ok, attempts = bench._backend_probe_with_retry()
    assert not ok and attempts == 2 and len(calls) == 2


def test_bench_wedged_backend_reports_last_known_good():
    env = dict(os.environ)
    # a 1-second probe budget is shorter than any jax import: the probe
    # subprocess always times out, which is exactly the wedged-tile shape
    env["TPU_DIALMPC_BENCH_PROBE_TIMEOUT"] = "1"
    # keep the parent bench.py interpreter itself off the tunnel relay
    # (sitecustomize registration costs ~110 s per process)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    out = subprocess.run(
        [sys.executable, "bench.py"],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    line = json.loads(out.stdout.strip().splitlines()[-1])
    assert line["value"] == -1.0 and "error" in line
    # the cached real-TPU measurement rides along for the record
    lkg = line["last_known_good"]
    assert lkg["unit"] == "ms/iteration" and lkg["value"] > 0
    assert lkg["platform"] != "cpu" and "measured_at" in lkg
