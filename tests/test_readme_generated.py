"""README's measured-numbers table must match the artifacts exactly.

The round-3 audit flagged hand-edited README numbers drifting from
QUALITY_r*.json for the third round running; the table is now generated
(tpu_dialmpc/tools/readme_table.py) and this test fails the fast lane the
moment it goes stale.  Pure file I/O — no jax import.
"""

import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def test_readme_table_matches_artifacts():
    p = subprocess.run(
        [sys.executable, "-m", "tpu_dialmpc.tools.readme_table", "--check"],
        cwd=ROOT, capture_output=True, text=True, timeout=60,
    )
    assert p.returncode == 0, p.stderr


def test_readme_has_generated_marker():
    text = (ROOT / "README.md").read_text()
    assert "BEGIN GENERATED: measured-numbers" in text
    assert "do not edit by hand" in text
