"""Worker for the 2-process jax.distributed CPU test (run by test_distributed).

Usage: python distributed_worker.py <port> <process_id> <num_processes> <out.npy>

Each process owns 2 fake CPU devices (xla_force_host_platform_device_count=2,
set by the parent); after `distributed.initialize` the global device count is
num_processes*2 and `make_multihost_mesh` builds the ("dcn", "sample") mesh
with hosts on the dcn axis — the layout of shard/distributed.py:49-61.  The
worker runs one sharded reverse_once (collective softmax + weighted-update
psum across processes) and writes the replicated result for the parent to
compare against the single-process planner.
"""

import os
import sys

port, pid, nproc, out = (
    sys.argv[1],
    int(sys.argv[2]),
    int(sys.argv[3]),
    sys.argv[4],
)
env_kind = sys.argv[5] if len(sys.argv) > 5 else "stub"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

_here = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _here)
sys.path.insert(0, os.path.dirname(_here))  # repo root for tpu_dialmpc
from stub_env import StubFusedEnv  # noqa: E402

from tpu_dialmpc.planner.dial import DialConfig  # noqa: E402
from tpu_dialmpc.shard import ShardedMBDPI, distributed  # noqa: E402

distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}",
    num_processes=nproc,
    process_id=pid,
)
assert jax.process_count() == nproc, jax.process_count()
assert len(jax.local_devices()) == 2
assert jax.device_count() == 2 * nproc

mesh = distributed.make_multihost_mesh()
assert mesh.axis_names == ("dcn", "sample")
assert mesh.devices.shape == (nproc, 2)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

cfg = DialConfig(Hsample=6, Hnode=2, Nsample=16, ctrl_dt=0.02, temp_sample=0.1)
if env_kind == "go2":
    # real contact physics: the collectives reduce genuinely state-dependent
    # rewards, not the stub's linear dynamics
    from tpu_dialmpc.envs import get_env  # noqa: E402

    env = get_env("go2_stand", n_substeps=1, dtype="float64", fused="off")
    state = env.reset(jax.random.PRNGKey(0))
    nu = env.action_size
elif env_kind == "h1":
    # BASELINE config #5 workload SHAPE (configs/h1_multihost.yaml): H1
    # whole-body physics (nu=19, crate scene) at the production horizon
    # Hsample=32/Hnode=8, Nsample scaled down for the CPU dryrun — the
    # cross-process collective layout is identical at any Nsample
    from tpu_dialmpc.envs import get_env  # noqa: E402

    cfg = DialConfig(
        Hsample=32, Hnode=8, Nsample=8, ctrl_dt=0.02, temp_sample=0.1
    )
    env = get_env("h1_push_crate", n_substeps=1, dtype="float64", fused="off")
    state = env.reset(jax.random.PRNGKey(0))
    nu = env.action_size
else:
    env = StubFusedEnv(fused=False)
    state = env.reset()
    nu = env.nu
planner = ShardedMBDPI(cfg, env, mesh)
Ybar = jnp.asarray(
    np.random.default_rng(0).uniform(-0.5, 0.5, (cfg.Hnode + 1, nu))
)
scale = jnp.full(cfg.Hnode + 1, 0.3)

# AOT-compile BEFORE the first collective execution, then barrier: Gloo
# contexts form lazily at the first collective with a hard-coded ~30 s
# key-exchange deadline, and cold XLA:CPU compiles of the real-physics
# planner exceed that skew on a contended 1-core host (see
# shard.distributed.barrier).  Compilation itself runs no collectives.
key = jax.random.PRNGKey(7)
compiled = jax.jit(planner.reverse_once).lower(state, key, Ybar, scale).compile()
distributed.barrier("reverse_once_compiled")
y, info = compiled(state, key, Ybar, scale)
# the control update is replicated (the sample axis is fully reduced), so
# every process holds the complete value; the per-candidate rewards stay
# sharded across processes and need an explicit allgather
from jax.experimental import multihost_utils  # noqa: E402

y_np = np.asarray(jax.device_get(y))
rews_np = np.asarray(multihost_utils.process_allgather(info.rews, tiled=True))
np.save(out, {"y": y_np, "rews": rews_np}, allow_pickle=True)
print(f"worker {pid}: ok", flush=True)
jax.distributed.shutdown()
