"""Control-quality e2e gates (TPU-only, slow): the tasks actually work.

The gate definitions (workloads + threshold checks + recorded envelopes)
live in tpu_dialmpc/quality.py, shared with the repo-root `quality.py`
harness that emits the per-round QUALITY_r{N}.json artifact — these tests
assert exactly what the artifact records.

They need the fused kernel (400-step receding-horizon runs), so they are
skipped off-TPU — the physics itself is oracle-tested on CPU elsewhere
(tests/test_smooth_dynamics.py, test_constrained_dynamics.py, test_fused.py).
"""

import jax
import pytest

from tpu_dialmpc import quality

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        jax.default_backend() != "tpu", reason="needs the fused TPU kernel"
    ),
]


@pytest.mark.parametrize("gate", list(quality.GATES))
def test_quality_gate(gate):
    result = quality.run_gate(gate)
    print(f"{gate}: {result['metrics']}")
    assert result["passed"], result["checks"]
