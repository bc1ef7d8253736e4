"""Per-round quality + scaling artifact harness.

Emits machine-readable artifacts the judge can diff across rounds (the
round-2 audit flagged that these numbers lived only in README prose):

  python quality.py                 # QUALITY_r{N}.json: the 9 TPU gates
  python quality.py --quick         # QUALITY_QUICK_r{N}.json: 150-step
                                    #   audit lane (~3x cheaper re-run)
  python quality.py --scaling       # SCALING_r{N}.json: 1-chip TPU row +
                                    #   8-virtual-CPU-mesh efficiency rows
  python quality.py --gates go2_trot h1_walk   # subset
  python quality.py --quick --seed 7           # different noise realization

The round number {N} is inferred as 1 + the highest BENCH_r{N}.json present
(the driver writes one per completed round); override with --out.

The scaling artifact runs two measurements:
  - the current backend (real TPU when available): mesh sizes that fit the
    visible devices (a single tunneled chip -> [1]);
  - a CPU subprocess with XLA_FLAGS=--xla_force_host_platform_device_count=8
    over mesh sizes [1,2,4,8] with real Go2 physics at a reduced Nsample —
    this validates the collective layout's scaling shape, not absolute perf.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import subprocess
import sys
import time


def _round_tag() -> str:
    rounds = [0]
    for f in glob.glob(os.path.join(os.path.dirname(__file__), "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", f)
        if m:
            rounds.append(int(m.group(1)))
    return f"r{max(rounds) + 1:02d}"


def _seed_spread(results):
    """Per-gate metric spread + seed-sensitivity flags across seed runs.

    A check is seed-sensitive when it passes under some seeds and fails
    under others — exactly the fragility the round-4 audit flagged
    (thresholds calibrated to one noise realization).
    """
    by_gate = {}
    for r in results:
        by_gate.setdefault(r["gate"], []).append(r)
    spread, sensitive = {}, []
    for gate, runs in by_gate.items():
        if len(runs) < 2:
            continue
        metrics = {}
        for m in runs[0]["metrics"]:
            vals = [r["metrics"][m] for r in runs if m in r["metrics"]]
            if vals and all(isinstance(v, (int, float)) for v in vals):
                metrics[m] = {
                    "min": round(min(vals), 4),
                    "max": round(max(vals), 4),
                    "by_seed": {
                        str(r["seed"]): round(r["metrics"][m], 4)
                        for r in runs if m in r["metrics"]
                    },
                }
        spread[gate] = metrics
        for i, chk in enumerate(runs[0]["checks"]):
            outcomes = {r["seed"]: r["checks"][i]["passed"] for r in runs}
            if len(set(outcomes.values())) > 1:
                sensitive.append(
                    {"gate": gate, "metric": chk["metric"],
                     "passed_by_seed": {str(k): v for k, v in outcomes.items()}}
                )
    return spread, sensitive


def run_quality(names, out_path, quick=False, seeds=None):
    import jax

    from tpu_dialmpc import quality as q

    seeds = list(seeds) if seeds else [None]
    t0 = time.time()
    results = []
    gate_names = names or list(q.GATES)
    for s in seeds:
        for n in gate_names:
            r = q.run_gate(n, quick=quick, seed=s)
            results.append(r)
            # per-gate progress (a 10-gate full run is ~1.5 h; a silent
            # harness is undiagnosable mid-run)
            line = {c["metric"]: round(c["measured"], 3) for c in r["checks"]}
            print(
                f"[{len(results)}/{len(seeds) * len(gate_names)}] "
                f"{n}[seed={r['seed']}]: passed={r['passed']} {line} "
                f"({r['wall_s']:.0f}s)",
                flush=True,
            )
    doc = {
        "artifact": "quality",
        "lane": "quick" if quick else "full",
        "platform": jax.default_backend(),
        "measured_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "wall_s": round(time.time() - t0, 1),
        "seeds": sorted({r["seed"] for r in results}),
        "gates": results,
        "all_passed": all(r["passed"] for r in results),
    }
    if len(seeds) > 1:
        doc["seed_spread"], doc["seed_sensitive_checks"] = _seed_spread(
            results
        )
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps({k: doc[k] for k in ("platform", "all_passed")}))
    print(f"wrote {out_path}")
    return 0 if doc["all_passed"] else 1


def _cpu_mesh_rows():
    """Run scaling_report on a fake 8-device CPU mesh in a subprocess.

    Uses the structural stub env: on a host where all virtual devices share
    the same cores (this box has ONE), mesh rows validate that the
    collective layout runs at every mesh size — they cannot measure real
    scaling efficiency (that is the TPU section's job)."""
    code = (
        "import json, sys\n"
        "sys.path.insert(0, 'tests')\n"
        "from stub_env import StubFusedEnv\n"
        "from tpu_dialmpc.shard.scaling import scaling_report\n"
        "rows = scaling_report(nsample=512, mesh_sizes=[1, 2, 4, 8],\n"
        "                      env=StubFusedEnv(fused=False))\n"
        "print('ROWS=' + json.dumps(rows))\n"
    )
    env = dict(
        os.environ,
        TPU_DIALMPC_PLATFORM="cpu",
        # host-feature-partitioned cache (same rationale as tests/conftest)
        TPU_DIALMPC_CACHE_DIR=os.path.expanduser(
            "~/.cache/tpu_dialmpc_test_xla"
        ),
        XLA_FLAGS=(
            os.environ.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=8"
        ).strip(),
    )
    p = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        env=env, timeout=3600,
    )
    for line in p.stdout.splitlines():
        if line.startswith("ROWS="):
            return json.loads(line[5:])
    raise RuntimeError(
        f"cpu mesh scaling failed (rc={p.returncode}): {p.stderr[-500:]}"
    )


def _cpu_collective_overhead():
    """Measure sharded-vs-unsharded overhead at identical total workload in
    a CPU subprocess (see shard/scaling.py:collective_overhead_report)."""
    code = (
        "import json, sys\n"
        "sys.path.insert(0, 'tests')\n"
        "from stub_env import StubFusedEnv\n"
        "from tpu_dialmpc.shard.scaling import collective_overhead_report\n"
        "row = collective_overhead_report(nsample=512, n_devices=8,\n"
        "                                 env=StubFusedEnv(fused=False))\n"
        "print('ROW=' + json.dumps(row))\n"
    )
    env = dict(
        os.environ,
        TPU_DIALMPC_PLATFORM="cpu",
        TPU_DIALMPC_CACHE_DIR=os.path.expanduser(
            "~/.cache/tpu_dialmpc_test_xla"
        ),
        XLA_FLAGS=(
            os.environ.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=8"
        ).strip(),
    )
    env.pop("PALLAS_AXON_POOL_IPS", None)
    p = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        env=env, timeout=3600,
    )
    for line in p.stdout.splitlines():
        if line.startswith("ROW="):
            return json.loads(line[4:])
    raise RuntimeError(
        f"collective overhead failed (rc={p.returncode}): {p.stderr[-500:]}"
    )


def _predicted_efficiency():
    """Predicted multi-host efficiency rows from MEASURED inputs:

    - per-chip compute_ms: BENCH_LAST_GOOD's real-TPU iteration times
      (config #4's per-chip share, 16384/8 chips = 2048/chip, is exactly
      the measured headline row);
    - config #5 (H1 whole-body, 8192 samples/chip, Hsample=32) compute is
      the measured go2 Nsample=16384 row rescaled by batch, horizon, and
      the traced per-substep arithmetic-op ratio of the two fused kernels
      (telemetry/profile.py:count_fused_ops — a trace-time count, not a
      guess);
    - payload: the weighted-update psum + scalar logsumexp/std psums.

    The DCN per-hop latency cannot be measured from one chip; rows span a
    conservative latency grid (50 us ICI-like .. 1 ms WAN-like).  Formula
    in shard/scaling.py:predicted_efficiency_rows and docs/OPERATIONS.md.
    """
    from tpu_dialmpc.shard.scaling import predicted_efficiency_rows

    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "BENCH_LAST_GOOD.json")) as f:
        bench = json.load(f)
    if bench.get("platform") == "cpu":
        raise RuntimeError("BENCH_LAST_GOOD is not a TPU measurement")
    ms_2048 = bench["value"]
    ms_16384 = next(
        e["value"] for e in bench["extra"] if "N16384" in e["metric"]
    )

    out = {}
    # config #4: go2 agility, Nsample=16384 over 8 chips -> 2048/chip
    out["config4_go2_agility_8chip"] = {
        "per_chip_compute_ms": ms_2048,
        "payload_bytes": (5 + 1) * 12 * 4 + 32,
        "rows": predicted_efficiency_rows(
            compute_ms=ms_2048, payload_bytes=(5 + 1) * 12 * 4 + 32,
            n_hosts_list=(1, 2, 4, 8),
        ),
    }
    # config #5: H1 whole-body, Nsample=131072 over 16 chips -> 8192/chip.
    # Preferred basis: the MEASURED h1_push_crate N=8192 row (bench.py
    # measures it on the chip since round 5 — closes the round-4 audit's
    # "H1 compute is proxied" gap).  Fallback for a pre-round-5
    # BENCH_LAST_GOOD: the traced arith-op-ratio rescale of the go2 row.
    h1_row = next(
        (
            e for e in bench.get("extra", [])
            if e.get("metric", "").startswith(
                "h1_push_crate_reverse_once_ms_N8192"
            ) and e.get("value", -1) > 0
        ),
        None,
    )
    if h1_row is not None:
        h1_ms = h1_row["value"]
        basis = {
            "measured_metric": h1_row["metric"],
            "measured_ms": h1_ms,
            "source": "BENCH_LAST_GOOD extra row (real TPU)",
        }
    else:
        from tpu_dialmpc.envs import get_env
        from tpu_dialmpc.telemetry.profile import count_fused_ops

        ops_h1 = count_fused_ops(
            get_env("h1_push_crate", n_substeps=8).model
        )["arith_ops_per_substep"]
        ops_go2 = count_fused_ops(
            get_env("go2_stand", n_substeps=8).model
        )["arith_ops_per_substep"]
        h1_ms = ms_16384 * (8192 / 16384) * (33 / 21) * (ops_h1 / ops_go2)
        basis = {
            "go2_N16384_ms": ms_16384,
            "arith_ops_per_substep_h1": ops_h1,
            "arith_ops_per_substep_go2": ops_go2,
            "source": "arith-op-ratio proxy (no measured H1 row in "
                      "BENCH_LAST_GOOD)",
        }
    out["config5_h1_multihost_16chip"] = {
        "per_chip_compute_ms": round(h1_ms, 3),
        "compute_basis": basis,
        "payload_bytes": (8 + 1) * 19 * 4 + 32,
        "rows": predicted_efficiency_rows(
            compute_ms=h1_ms, payload_bytes=(8 + 1) * 19 * 4 + 32,
            n_hosts_list=(1, 2, 4, 8, 16),
        ),
    }
    return out


def run_scaling(out_path):
    import jax

    from tpu_dialmpc.shard.scaling import scaling_report

    backend = jax.default_backend()
    native_rows = scaling_report()  # sizes that fit the visible devices
    doc = {
        "artifact": "scaling",
        "measured_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "native": {"platform": backend, "rows": native_rows},
    }
    try:
        doc["cpu_mesh_8dev"] = {
            "platform": (
                "cpu (8 virtual devices on a 1-core host, stub env, "
                "Nsample=512) — collective-layout validation only; "
                "virtual devices share the core, so efficiency-vs-linear "
                "is not a hardware scaling measurement"
            ),
            "rows": _cpu_mesh_rows(),
        }
    except Exception as e:
        doc["cpu_mesh_8dev"] = {"error": str(e)[:500]}
    try:
        doc["collective_overhead_cpu_mesh"] = _cpu_collective_overhead()
    except Exception as e:
        doc["collective_overhead_cpu_mesh"] = {"error": str(e)[:500]}
    try:
        doc["predicted_multihost"] = _predicted_efficiency()
    except Exception as e:
        doc["predicted_multihost"] = {"error": str(e)[:500]}
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps(doc["native"]))
    print(f"wrote {out_path}")
    return 0


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--scaling", action="store_true")
    p.add_argument("--gates", nargs="*", default=None)
    p.add_argument("--out", default=None)
    p.add_argument(
        "--quick", action="store_true",
        help="150-step audit lane: same tasks/planner/metrics, re-derived "
             "thresholds, ~3x cheaper than the full 400-step gates "
             "(writes QUALITY_QUICK_r{N}.json)",
    )
    p.add_argument(
        "--seed", type=int, default=None,
        help="override the planner seed (noise + reset key): thresholds are "
             "envelopes and must hold across seeds, not fit one trajectory",
    )
    p.add_argument(
        "--seeds", type=int, nargs="+", default=None,
        help="run every gate once per seed and record per-seed metric "
             "spread + seed-sensitivity flags in one artifact (round-4 "
             "audit: single-seed gates can hide threshold fragility)",
    )
    args = p.parse_args(argv)
    tag = _round_tag()
    if args.scaling:
        return run_scaling(args.out or f"SCALING_{tag}.json")
    default_out = (
        f"QUALITY_QUICK_{tag}.json" if args.quick else f"QUALITY_{tag}.json"
    )
    seeds = args.seeds if args.seeds else ([args.seed] if args.seed is not None else None)
    return run_quality(
        args.gates, args.out or default_out, quick=args.quick, seeds=seeds
    )


if __name__ == "__main__":
    sys.exit(main())
