"""Test configuration: run on CPU with 8 virtual devices, float64 enabled.

Multi-chip sharding tests use the fake 8-device CPU mesh; numeric parity tests
against the CPU MuJoCo oracle use float64.

Note: a sitecustomize may pre-import jax with JAX_PLATFORMS pointing at a TPU
plugin, so env vars alone are too late — use jax.config.update, which wins at
backend-initialization time as long as no computation has run yet.
"""

import os

# avoid the persistent XLA cache in tests (remote-compiled CPU AOT artifacts
# can carry mismatched machine features)
os.environ.setdefault("TPU_DIALMPC_NO_CACHE", "1")

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

if os.environ.get("TPU_DIALMPC_TEST_TPU"):
    # hardware mode: run the TPU-gated tests (test_quality_tpu, step_lean
    # equality) on the real chip — everything else still passes, but the
    # float64 oracle-parity tests are meant for the CPU default below
    jax.config.update("jax_enable_x64", False)
else:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
