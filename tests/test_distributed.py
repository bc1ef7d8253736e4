"""Multi-process distributed execution of the sharded planner (CPU).

Two OS processes, each with 2 fake CPU devices, bootstrap via
`jax.distributed.initialize` (shard/distributed.py), build the
("dcn", "sample") multihost mesh, and run one sharded reverse_once whose
softmax/psum collectives cross the process boundary.  Both processes must
produce the single-process planner's exact result — the moral equivalent of
the cross-host reduction row in SURVEY §2.6.
"""

import os
import socket
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_dialmpc.planner.dial import DialConfig, MBDPI

from stub_env import StubFusedEnv

_WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)), "distributed_worker.py")


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
@pytest.mark.parametrize("env_kind", ["stub", "go2", "h1"])
def test_two_process_distributed_reverse_once(tmp_path, env_kind):
    nproc = 2
    port = _free_port()
    env_base = dict(os.environ)
    env_base.pop("JAX_PLATFORMS", None)
    env_base["JAX_PLATFORMS"] = "cpu"
    # CPU workers must not register the axon TPU plugin: sitecustomize's
    # register() dials the tunnel relay (~110 s of waiting per interpreter)
    env_base.pop("PALLAS_AXON_POOL_IPS", None)
    env_base["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    # workers share the host-tagged test cache (see conftest) — the h1
    # case's crate-scene step is ~10 min of XLA:CPU compile when cold
    env_base.pop("TPU_DIALMPC_NO_CACHE", None)
    env_base.setdefault(
        "TPU_DIALMPC_CACHE_DIR",
        os.path.join(
            os.path.expanduser("~"), ".cache", "tpu_dialmpc_test_xla"
        ),
    )
    procs = []
    outs = []
    for pid in range(nproc):
        out = str(tmp_path / f"w{pid}.npy")
        outs.append(out)
        procs.append(
            subprocess.Popen(
                [
                    sys.executable,
                    _WORKER,
                    str(port),
                    str(pid),
                    str(nproc),
                    out,
                    env_kind,
                ],
                env=env_base,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    logs = []
    for p in procs:
        try:
            # the h1 case compiles the 56-constraint-slot crate step on
            # XLA-CPU (~10 min cold under load); budget accordingly
            stdout, _ = p.communicate(timeout=2400)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(stdout)
        assert p.returncode == 0, f"worker failed:\n{stdout}"

    # expected: single-process planner, same key (identical partitionable
    # threefry noise regardless of process/mesh layout)
    cfg = DialConfig(
        Hsample=6, Hnode=2, Nsample=16, ctrl_dt=0.02, temp_sample=0.1
    )
    if env_kind == "go2":
        from tpu_dialmpc.envs import get_env

        env = get_env("go2_stand", n_substeps=1, dtype="float64", fused="off")
        state = env.reset(jax.random.PRNGKey(0))
        nu = env.action_size
    elif env_kind == "h1":
        # BASELINE config #5 shape (configs/h1_multihost.yaml) — must stay in
        # sync with distributed_worker.py's "h1" branch
        from tpu_dialmpc.envs import get_env

        cfg = DialConfig(
            Hsample=32, Hnode=8, Nsample=8, ctrl_dt=0.02, temp_sample=0.1
        )
        env = get_env(
            "h1_push_crate", n_substeps=1, dtype="float64", fused="off"
        )
        state = env.reset(jax.random.PRNGKey(0))
        nu = env.action_size
    else:
        env = StubFusedEnv(fused=False)
        state = env.reset()
        nu = env.nu
    mbdpi = MBDPI(cfg, env)
    Ybar = jnp.asarray(
        np.random.default_rng(0).uniform(-0.5, 0.5, (cfg.Hnode + 1, nu))
    )
    scale = jnp.full(cfg.Hnode + 1, 0.3)
    want_y, want_info = mbdpi.reverse_once(
        state, jax.random.PRNGKey(7), Ybar, scale
    )

    for out, log in zip(outs, logs):
        assert os.path.exists(out), f"worker wrote no output:\n{log}"
        got = np.load(out, allow_pickle=True).item()
        np.testing.assert_allclose(got["y"], np.asarray(want_y), atol=1e-9)
        np.testing.assert_allclose(
            got["rews"], np.asarray(want_info.rews), atol=1e-9
        )
