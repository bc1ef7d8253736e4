"""Docs must not cite round artifacts that don't exist.

Round-4 audit: docs/OPERATIONS.md cited `SCALING_r04.json` rows that were
never generated — the third round running of prose drifting from artifacts
(README's measured-numbers table is already generated + drift-tested; this
extends the same treatment to artifact *citations* anywhere in the docs).
Any `<NAME>_r<N>.json` mentioned in README.md or docs/*.md must exist at
the repo root.
"""

import glob
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ARTIFACT_RE = re.compile(r"\b([A-Z][A-Z_]*_r\d+\.json)\b")


def _doc_files():
    docs = [os.path.join(REPO, "README.md")]
    docs += sorted(glob.glob(os.path.join(REPO, "docs", "*.md")))
    return docs


def test_cited_round_artifacts_exist():
    missing = []
    for path in _doc_files():
        with open(path) as f:
            text = f.read()
        for m in ARTIFACT_RE.finditer(text):
            name = m.group(1)
            if not os.path.exists(os.path.join(REPO, name)):
                missing.append(f"{os.path.relpath(path, REPO)} cites {name}")
    assert not missing, (
        "docs cite nonexistent round artifacts (generate them or fix the "
        "citation):\n  " + "\n  ".join(missing)
    )


def test_doc_scan_actually_finds_citations():
    """Guard the guard: the regex must match at least one real citation
    across the docs, otherwise a rename of the artifact naming scheme
    would silently turn the drift test into a no-op."""
    found = []
    for path in _doc_files():
        with open(path) as f:
            found += ARTIFACT_RE.findall(f.read())
    assert found, "no artifact citations found anywhere — regex stale?"
