"""Test configuration: run on CPU with 8 virtual devices, float64 enabled.

Multi-chip sharding tests use the fake 8-device CPU mesh; numeric parity tests
against the CPU MuJoCo oracle use float64.  Must run before jax is imported.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_enable_x64", True)
