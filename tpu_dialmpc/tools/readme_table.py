"""Render README's measured-numbers table from the round artifacts.

The round-3 audit found README prose drifting from the artifacts for the
third round running (e.g. "trot covers 5.6 m" vs QUALITY_r03's measured
5.0 m).  Fix it structurally: the canonical numbers live in ONE generated
block, sourced from BENCH_LAST_GOOD.json (the latest real-TPU benchmark,
written by bench.py) and the newest QUALITY_r*.json (the per-round gate
artifact, written by quality.py), delimited by HTML markers:

    <!-- BEGIN GENERATED: measured-numbers ... -->
    ...
    <!-- END GENERATED: measured-numbers -->

Usage:
    python -m tpu_dialmpc.tools.readme_table           # rewrite README.md
    python -m tpu_dialmpc.tools.readme_table --check   # exit 1 on drift

tests/test_readme_generated.py runs the --check mode in the fast lane, so
a stale table fails CI the moment an artifact changes.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

BEGIN_RE = re.compile(r"<!-- BEGIN GENERATED: measured-numbers[^>]*-->")
END = "<!-- END GENERATED: measured-numbers -->"


def _repo_root() -> str:
    return os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _latest_quality(root: str) -> tuple[str, dict] | None:
    files = sorted(glob.glob(os.path.join(root, "QUALITY_r*.json")))
    if not files:
        return None
    with open(files[-1]) as f:
        return os.path.basename(files[-1]), json.load(f)


def _bench(root: str) -> tuple[str, dict] | None:
    p = os.path.join(root, "BENCH_LAST_GOOD.json")
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return "BENCH_LAST_GOOD.json", json.load(f)


def _fmt(v, nd=3):
    if isinstance(v, float):
        s = f"{v:.{nd}f}"
        return s.rstrip("0").rstrip(".") if "." in s else s
    return str(v)


def render(root: str | None = None) -> str:
    """The generated block body (between, not including, the markers)."""
    root = root or _repo_root()
    lines: list[str] = []
    sources = []

    b = _bench(root)
    if b:
        src, doc = b
        sources.append(src)
        lines += [
            "",
            f"**Benchmark** ({src}, measured {doc.get('measured_at', '?')}, "
            f"platform {doc.get('platform', '?')}):",
            "",
            "| metric | value | unit | vs budget |",
            "|---|---|---|---|",
        ]
        rows = [doc] + [
            e for e in doc.get("extra", []) if e.get("metric") != "skipped"
        ]
        for r in rows:
            lines.append(
                f"| {r['metric']} | {_fmt(r['value'])} | {r['unit']} "
                f"| {_fmt(r.get('vs_baseline', ''))} |"
            )
        roof = next(
            (e for e in doc.get("extra", []) if "roofline" in e.get("metric", "")),
            None,
        )
        if roof and "measured_ms_attempts" in roof:
            lines += [
                "",
                f"Roofline provenance: microbench roof "
                f"{_fmt(roof.get('microbench_peak_gops', '?'), 2)} Gops/s, "
                f"raised by kernel evidence: "
                f"{roof.get('roof_raised_by_kernel_evidence', '?')}; "
                f"kernel ms across attempts "
                f"{roof['measured_ms_attempts']} (min is the capability "
                f"estimate; fraction at the median attempt "
                f"{_fmt(roof.get('fraction_at_median_attempt', '?'))}).",
            ]

    q = _latest_quality(root)
    if q:
        src, doc = q
        sources.append(src)
        # per-gate timestamps (round-4 advisor: a merged artifact showed
        # gates measured hours apart under one top-level stamp — surface
        # the range, not a single instant, when they differ)
        stamps = sorted(
            {g["measured_at"] for g in doc.get("gates", [])
             if g.get("measured_at")}
        )
        if len(stamps) > 1 and stamps[0] != stamps[-1]:
            when = f"{stamps[0]} .. {stamps[-1]}"
        else:
            when = stamps[0] if stamps else doc.get("measured_at", "?")
        lines += [
            "",
            f"**Quality gates** ({src}, measured {when}, "
            f"platform {doc.get('platform', '?')}, "
            f"{_fmt(doc.get('wall_s', 0) / 60, 0)} min wall):",
            "",
            "| gate | distance (m) | z_min (m) | dones | worst cause | passed |",
            "|---|---|---|---|---|---|",
        ]
        for g in doc.get("gates", []):
            m = g["metrics"]
            causes = {
                "inverted": m.get("dones_inverted_mean"),
                "joint": m.get("dones_joint_mean"),
                "height": m.get("dones_height_mean"),
            }
            if any(v is not None for v in causes.values()):
                worst = max(causes, key=lambda k: causes[k] or 0.0)
                cause = (
                    "—" if (causes[worst] or 0.0) == 0.0
                    else f"{worst} {_fmt(causes[worst])}"
                )
            else:
                cause = "n/a"
            lines.append(
                f"| {g['gate']} | {_fmt(m.get('x_final'), 2)} "
                f"| {_fmt(m.get('z_min'), 3)} | {_fmt(m.get('dones_mean'), 4)} "
                f"| {cause} | {'yes' if g['passed'] else 'NO'} |"
            )

    header = (
        f"<!-- BEGIN GENERATED: measured-numbers (from {', '.join(sources)} "
        "by tpu_dialmpc/tools/readme_table.py — do not edit by hand) -->"
    )
    return "\n".join([header] + lines + ["", END])


def apply(readme_path: str | None = None, check: bool = False) -> int:
    root = _repo_root()
    readme_path = readme_path or os.path.join(root, "README.md")
    with open(readme_path) as f:
        text = f.read()
    m = BEGIN_RE.search(text)
    if not m or END not in text:
        print("README.md has no measured-numbers markers", file=sys.stderr)
        return 1
    start, stop = m.start(), text.index(END) + len(END)
    block = render(root)
    new = text[:start] + block + text[stop:]
    if check:
        if new != text:
            print(
                "README measured-numbers table is stale — run "
                "`python -m tpu_dialmpc.tools.readme_table`",
                file=sys.stderr,
            )
            return 1
        return 0
    if new != text:
        with open(readme_path, "w") as f:
            f.write(new)
        print(f"updated {readme_path}")
    else:
        print("README already up to date")
    return 0


if __name__ == "__main__":
    sys.exit(apply(check="--check" in sys.argv))
