"""Failure detection / recovery: the run loop resumes from the last
checkpoint after an injected fault and reproduces the fault-free trajectory
(SURVEY §5: planner is stateless per solve — restartable from (Y0, state))."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpu_dialmpc.envs import get_env
from tpu_dialmpc.planner import runner
from tpu_dialmpc.planner.dial import DialConfig


def _cfg():
    return DialConfig(
        Hsample=4, Hnode=2, Nsample=4, Ndiffuse=1, Ndiffuse_init=1, n_steps=6
    )


@pytest.mark.slow
def test_run_recovers_from_injected_fault(tmp_path, monkeypatch):
    env = get_env("go2_stand", n_substeps=1)
    clean = runner.run(env, _cfg())

    calls = {"n": 0, "raised": False}
    orig = runner.make_control_step

    def flaky(mbdpi, n_diffuse):
        fn = orig(mbdpi, n_diffuse)

        def wrapped(state, Y0, k):
            calls["n"] += 1
            if calls["n"] == 5 and not calls["raised"]:
                calls["raised"] = True
                raise RuntimeError("injected fault")
            return fn(state, Y0, k)

        return wrapped

    monkeypatch.setattr(runner, "make_control_step", flaky)
    ck = str(tmp_path / "ck.npz")
    res = runner.run(
        env, _cfg(), checkpoint_path=ck, checkpoint_every=2, max_retries=1
    )
    assert calls["raised"]
    assert res.rewards.shape[0] == 6
    # recovery replays to the identical trajectory (same key stream)
    np.testing.assert_allclose(
        np.asarray(res.qpos), np.asarray(clean.qpos), atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(res.rewards), np.asarray(clean.rewards), atol=1e-12
    )


def test_run_without_retries_raises(monkeypatch):
    env = get_env("go2_stand", n_substeps=1)

    def always_fail(mbdpi, n_diffuse):
        def wrapped(state, Y0, k):
            raise RuntimeError("boom")

        return wrapped

    monkeypatch.setattr(runner, "make_control_step", always_fail)
    with pytest.raises(RuntimeError, match="boom"):
        runner.run(env, _cfg())
