"""Device mesh construction for sample-parallel DIAL-MPC.

The reference has no parallelism at all (SURVEY §2.6: `rollout_us_batch` is a
sequential for loop, dial-core.h:443-456).  The TPU-native parallel axis is the
*sample* axis: Nsample candidate rollouts shard across chips (the DP analog),
the horizon stays a per-sample `lax.scan`, and the softmax-weighted update
reduces across the mesh with XLA collectives (psum — only O(Hnode·nu) bytes
cross the ICI per iteration).

Mesh layout: a single "sample" axis for one host; ("dcn", "sample") for
multi-host slices, with the sample axis riding ICI and only scalar logsumexp
partials crossing DCN.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec


def make_mesh(
    n_devices: Optional[int] = None,
    devices: Optional[Sequence] = None,
    dcn_axis: int = 1,
) -> Mesh:
    """Build a ("dcn", "sample") mesh; dcn axis size 1 on a single host."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    devices = np.asarray(devices)
    if dcn_axis > 1:
        if devices.size % dcn_axis:
            raise ValueError("device count not divisible by dcn axis")
        grid = devices.reshape(dcn_axis, -1)
    else:
        grid = devices.reshape(1, -1)
    return Mesh(grid, ("dcn", "sample"))


def sample_sharding(mesh: Mesh) -> NamedSharding:
    """Shard leading (sample) axis over all mesh axes, rest replicated."""
    return NamedSharding(mesh, PartitionSpec(("dcn", "sample")))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec())
