"""CLI surface smoke tests — argument wiring of the subcommands that the
deeper suites exercise only at module level (plot, env-test, ik).

`run`/`replay` wiring is covered in test_cli.py, `render` internals in
test_render.py, `profile`/`scaling` internals in test_profile.py /
test_scaling.py; these tests pin the argparse→cmd_* plumbing itself so a
renamed flag or default regression fails fast.  Reference counterparts:
plot = the gnuplot fork's charts (dial_mpc_eigen_plotting/src/
dial-core-simulate.cpp:219-329), env-test = unitree-go2-env-test.cpp:91-204,
ik = dial_mpc/src/legged_robot_ik.cpp.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_dialmpc.cli.main import main


@pytest.fixture(scope="module")
def tiny_traj(tmp_path_factory):
    """A 3-step trajectory npz with the exact keys `cli run --out` writes,
    built by stepping the real env (no planner compile needed)."""
    from tpu_dialmpc.envs import get_env

    env = get_env("go2_stand", n_substeps=1)
    state = env.reset(jax.random.PRNGKey(0))
    q0 = np.asarray(state.pipeline.qpos)
    v0 = np.asarray(state.pipeline.qvel)
    w0 = np.asarray(state.pipeline.qacc_warmstart)
    step = jax.jit(env.step)
    us, qpos, qvel, rewards, dones = [], [], [], [], []
    for t in range(3):
        u = jnp.zeros(env.action_size)
        state = step(state, u)
        us.append(np.asarray(u))
        qpos.append(np.asarray(state.pipeline.qpos))
        qvel.append(np.asarray(state.pipeline.qvel))
        rewards.append(float(state.reward))
        dones.append(float(state.done))
    path = tmp_path_factory.mktemp("traj") / "traj.npz"
    np.savez(
        path,
        rewards=np.asarray(rewards),
        qpos=np.asarray(qpos),
        qvel=np.asarray(qvel),
        us=np.asarray(us),
        dones=np.asarray(dones),
        qpos0=q0,
        qvel0=v0,
        warmstart0=w0,
        dt=float(env.dt),
    )
    return str(path)


def test_plot_cli(tiny_traj, tmp_path, capsys):
    out = str(tmp_path / "charts.png")
    assert main(["plot", "--trajectory", tiny_traj, "--out", out]) == 0
    assert "plots saved" in capsys.readouterr().out
    import os

    assert os.path.getsize(out) > 1000  # a real PNG, not an empty file


def test_env_test_cli(capsys):
    rc = main(["env-test", "--task", "go2_stand", "--substeps", "1",
               "--n-steps", "3"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "final qpos[:7]" in out
    assert "z=" in out  # per-step state prints


def test_ik_cli_feet_pinning(capsys):
    rc = main(["ik", "--task", "go2_stand", "--mode", "ik", "--dz", "-0.03"])
    assert rc == 0
    out = capsys.readouterr().out
    # Gauss-Newton should pin the feet to sub-mm residual for a 3 cm squat
    res = float(out.split("feet-position residual:")[1].split("m")[0])
    assert res < 1e-3
    assert "joint angles:" in out


def test_ik_cli_settle(capsys):
    rc = main(["ik", "--task", "go2_stand", "--mode", "settle",
               "--dz", "0.01", "--substeps", "1"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "base:" in out and "joint angles:" in out
