"""Multi-host bootstrap: jax.distributed + a DCN-aware sample mesh.

The reference is single-process/single-thread (SURVEY §2.6); the TPU-native
scale-out path is: one process per host, `jax.distributed.initialize`, and a
("dcn", "sample") mesh where the host axis (DCN) only ever carries the
O(Hnode*nu) psum of the softmax-weighted update plus scalar logsumexp partials
— all candidate generation and rollouts are shard-local on ICI.

Usage (per host):
    from tpu_dialmpc.shard import distributed
    distributed.initialize()             # env-var driven on TPU pods
    mesh = distributed.make_multihost_mesh()
    planner = ShardedMBDPI(cfg, env, mesh)

On a TPU pod slice `initialize()` needs no arguments (the TPU runtime supplies
coordinator/process topology); elsewhere pass coordinator_address /
num_processes / process_id explicitly.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """jax.distributed.initialize, idempotent."""
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:
        # already initialized — jax 0.9 phrases this "should only be called
        # once."; older versions say "already initialized"
        msg = str(e).lower()
        if "already" not in msg and "once" not in msg:
            raise


def barrier(name: str, timeout_s: float = 1200.0) -> None:
    """Block until every process reaches this barrier (coordination service).

    Use before the FIRST collective execution after heavy per-process work
    (XLA compiles, data loading).  Rationale: CPU Gloo contexts are created
    lazily at the first collective with a hard-coded ~30 s key-exchange
    deadline (xla gloo_kv_store); if one process reaches the collective while
    a peer is still compiling — trivially >30 s skew for cold planner graphs
    on a contended host — the fast process dies with
    "Gloo context initialization failed: DEADLINE_EXCEEDED".  The
    coordination-service barrier used here has a configurable timeout, so
    arbitrarily skewed compile times collapse to a synchronized entry into
    the Gloo exchange.  (TPU pods don't need this — collectives ride ICI via
    the TPU runtime — but it is harmless there.)
    """
    from jax._src import distributed as _dist

    client = _dist.global_state.client
    if client is None:  # single-process: nothing to synchronize
        return
    client.wait_at_barrier(name, timeout_in_ms=int(timeout_s * 1000))


def make_multihost_mesh() -> Mesh:
    """("dcn", "sample") mesh: hosts on the dcn axis, local chips on sample.

    Devices are grouped by process index so the sample axis stays within each
    host's ICI domain and only the dcn axis crosses hosts.
    """
    devices = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    n_proc = max(d.process_index for d in devices) + 1
    per_host = len(devices) // n_proc
    if per_host * n_proc != len(devices):
        raise ValueError("uneven devices per host")
    grid = np.array(devices).reshape(n_proc, per_host)
    return Mesh(grid, ("dcn", "sample"))
