"""CLI config-resolution tests: registry dial defaults < YAML < flags.

The reference hard-codes planner configs in each main()
(dial-core-test.cpp:8-34); here the task registry binds validated planner
defaults per task so `run --task X` executes the real workload."""

import argparse

import numpy as np
import pytest

from tpu_dialmpc.cli.main import _build, main
from tpu_dialmpc.envs.registry import dial_defaults


def _ns(**kw):
    base = dict(
        task="go2_stand",
        config=None,
        nsample=None,
        hsample=None,
        n_steps=None,
        substeps=None,
    )
    base.update(kw)
    return argparse.Namespace(**base)


def test_dial_defaults_per_family():
    go2 = dial_defaults("go2_trot")
    h1 = dial_defaults("h1_push_crate")
    assert (go2["Hsample"], go2["Hnode"]) == (20, 5)
    assert (h1["Hsample"], h1["Hnode"]) == (32, 8)  # biped lookahead
    assert go2["Nsample"] == h1["Nsample"] == 2048


def test_build_uses_registry_defaults_and_flag_overrides():
    env, dial, task = _build(
        _ns(task="h1_walk", nsample=64, n_steps=5, substeps=1)
    )
    assert task == "h1_walk"
    assert (dial.Hsample, dial.Hnode) == (32, 8)  # from the registry
    assert dial.Nsample == 64  # flag wins
    assert dial.n_steps == 5
    assert env.config.n_substeps == 1  # flag wins over the substepped default


def test_registered_tasks_default_to_substepping():
    env, dial, _ = _build(_ns(task="go2_stand"))
    assert env.config.n_substeps == 8  # Q2 fixed by default
    assert dial.Nsample == 2048 and dial.n_steps == 400


def test_register_env_custom_dial(recwarn):
    """Externally registered tasks carry their own planner defaults; ones
    registered without them warn and get the quadruped baseline."""
    from tpu_dialmpc.envs.registry import _REGISTRY, register_env

    try:
        register_env("_test_biped", dial=dict(Hsample=40, Hnode=10))(
            lambda **kw: None
        )
        assert dial_defaults("_test_biped")["Hsample"] == 40

        register_env("_test_nodefaults")(lambda **kw: None)
        import warnings

        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            d = dial_defaults("_test_nodefaults")
        assert d["Hsample"] == 20 and len(w) == 1
    finally:
        _REGISTRY.pop("_test_biped", None)
        _REGISTRY.pop("_test_nodefaults", None)
        from tpu_dialmpc.envs.registry import _DIAL_DEFAULTS

        _DIAL_DEFAULTS.pop("_test_biped", None)


@pytest.mark.slow
def test_resumed_run_replays_exactly(tmp_path, capsys):
    """run --checkpoint → run --resume --out → replay is drift-free.

    The trajectory npz carries the predecessor state including its Newton
    warmstart (qpos0/qvel0/warmstart0): the truncated-iteration solver's
    starting point is observable, so without restoring it a resumed run's
    replay diverges at t=0 (the regression this pins)."""
    cfg = tmp_path / "cfg.yaml"
    cfg.write_text(
        "task: go2_stand\n"
        "env: {n_substeps: 1}\n"
        "dial: {Nsample: 4, Hsample: 4, Hnode: 2, Ndiffuse: 1, "
        "Ndiffuse_init: 1, n_steps: 2}\n"
    )
    ck = str(tmp_path / "ck.npz")
    traj = str(tmp_path / "traj.npz")
    assert main(["run", "--config", str(cfg), "--checkpoint", ck]) == 0
    assert (
        main(
            ["run", "--config", str(cfg), "--resume", ck, "--n-steps", "4",
             "--out", traj]
        )
        == 0
    )
    data = np.load(traj)
    # the resume checkpoint was written after 2 steps: its warmstart is live
    assert "warmstart0" in data and np.abs(data["warmstart0"]).max() > 0
    assert float(data["dt"]) > 0
    capsys.readouterr()
    assert main(["replay", "--config", str(cfg), "--trajectory", traj]) == 0
    out = capsys.readouterr().out
    drift = float(out.rsplit("final qpos drift", 1)[1].strip())
    assert drift < 1e-8, out
