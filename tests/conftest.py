"""Test configuration: run on CPU with 8 virtual devices, float64 enabled.

Multi-chip sharding tests use the fake 8-device CPU mesh; numeric parity tests
against the CPU MuJoCo oracle use float64.

Note: a sitecustomize may pre-import jax with JAX_PLATFORMS pointing at a TPU
plugin, so env vars alone are too late — use jax.config.update, which wins at
backend-initialization time as long as no computation has run yet.
"""

import os

# Tests USE the persistent XLA compilation cache (round-2 disabled it over
# stale-artifact fears, at the cost of recompiling everything every run —
# the fast lane was 9 min of mostly XLA:CPU compiles).  Safety comes from
# partitioning, not avoidance: the package's cache dir is keyed by host CPU
# flags + the EFFECTIVE platform selection (tpu_dialmpc/__init__._host_tag),
# so remote-tunnel AOT artifacts can never be loaded by a local-CPU test
# run.  A dedicated test dir keeps test-shape programs from churning the
# production cache.  Measured: the compile-heavy H1 leash test drops 61 s ->
# 23 s warm.  Opt out with TPU_DIALMPC_NO_CACHE=1.
if not os.environ.get("TPU_DIALMPC_NO_CACHE"):
    os.environ.setdefault(
        "TPU_DIALMPC_CACHE_DIR",
        os.path.join(
            os.path.expanduser("~"), ".cache", "tpu_dialmpc_test_xla"
        ),
    )

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

_TPU_MODE = bool(os.environ.get("TPU_DIALMPC_TEST_TPU"))
if _TPU_MODE:
    # hardware mode: run the TPU-gated tests (test_quality_tpu, step_lean
    # equality) on the real chip; the float64/tight-tolerance oracle-parity
    # modules below are skipped — their asserts are calibrated for the CPU
    # x64 default and would fail on precision, not correctness
    jax.config.update("jax_enable_x64", False)
else:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

# modules whose tolerances assume float64 / the CPU backend
_F64_ONLY_FILES = {
    "test_smooth_dynamics.py",
    "test_constrained_dynamics.py",
    "test_reference_parity.py",
    "test_binary_parity.py",
    "test_rotations.py",
    "test_spline.py",
    "test_fused.py",  # eager-math parity vs the float64 XLA pipeline
    "test_shard.py",
    "test_shard_real_env.py",
    "test_shard_fused_branch.py",
    "test_distributed.py",  # spawns CPU subprocess meshes
    "test_e2e.py",
    "test_cost_dial.py",
}


def pytest_collection_modifyitems(config, items):
    if not _TPU_MODE:
        return
    import pytest

    skip = pytest.mark.skip(
        reason="float64/CPU-calibrated tolerances (TPU_DIALMPC_TEST_TPU=1)"
    )
    for item in items:
        if os.path.basename(str(item.fspath)) in _F64_ONLY_FILES:
            item.add_marker(skip)
