"""Parity vs the COMPILED reference binary (not an emulator of it).

tests/native/parity_shim.cpp #includes the unmodified reference headers
(/root/reference/dial_mpc_eigen/include/{dial-core.h,unitree-go2-env.h}),
links the real libmujoco, and dumps per-anneal noise / node trajectories /
candidate rewards / physics states (see parity_native.py).  These tests
assert the rebuild against that binary:

 - test_emulator_matches_compiled_reference (fast): certifies the numpy
   RefEmulator (tests/test_reference_parity.py) against the binary at
   machine precision — measured 3e-16 node diff over a full warm-start +
   receding-horizon loop.  This run discovered quirk Q10: the C++ builds
   joint_range_ from jnt_range rows 0..11, i.e. INCLUDING the freejoint's
   (0,0) row (unitree-go2-env.h:324-331), pinning act[0]'s target to 0 and
   shifting every other actuator's range one joint over.
 - test_jax_compat_matches_compiled_reference_toy (slow): the JAX planner in
   full compat mode (Q1 chain + Q2 single-step + "ref" spline + eigen yaw +
   time-std + Q10 ranges) free-runs the dial-core-test.cpp:6-109 driver and
   must match the binary's executed controls and node trajectories within
   the 1e-3 north-star budget.
 - test_jax_matches_compiled_reference_benchmark_scale (slow): benchmark
   geometry (Hsample=25, Hnode=5, Nsample=64, Ndiffuse_init=10, 10 control
   steps) at the REFERENCE temperature 0.05, state-resynced per decision:
   per-candidate rewards, selected-candidate (argmax) agreement, and
   executed-control/node agreement on decisions with a clear logit gap.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pytest

import parity_native as pn

pytestmark = pytest.mark.skipif(
    not pn.available(), reason="reference headers / toolchain not present"
)

NQ, NV, NU = 19, 18, 12


@pytest.fixture(scope="module")
def scene_xml(tmp_path_factory):
    return pn.stage_assets(tmp_path_factory.mktemp("stage"))


@pytest.fixture(scope="module")
def oracle_toy(scene_xml, tmp_path_factory):
    return pn.run_shim(
        tmp_path_factory.mktemp("toy"), scene_xml,
        Hsample=5, Hnode=2, Nsample=6, Ndiffuse=2, Ndiffuse_init=2,
        n_steps=3, seed=0, warmstart=True,
    )


def _cfg(**kw):
    from test_reference_parity import _parity_cfg

    return _parity_cfg(**kw)


def _split_phys(row):
    return row[:NQ], row[NQ : NQ + NV], row[NQ + NV :]


def test_emulator_matches_compiled_reference(oracle_toy):
    """RefEmulator ≡ the compiled reference, machine precision.

    Replays the binary's own noise through the emulator along the exact
    driver flow (warm-start reverse unrolled + receding-horizon loop,
    dial-core-test.cpp:47-99) and requires float64 round-off agreement —
    this retroactively certifies every emulator-based parity claim in
    test_reference_parity.py against the real binary."""
    from test_reference_parity import RefEmulator

    o = oracle_toy
    cfg = _cfg(Hsample=5, Hnode=2, Nsample=6)
    emu = RefEmulator(cfg)
    info = emu.reset()
    H1 = cfg.Hnode + 1
    Y = np.zeros((H1, NU))
    sigmas = 1e-2 * np.exp(
        np.log(100.0) / cfg.Ndiffuse * np.arange(cfg.Ndiffuse)
    )
    k = 0

    def anneal(info, Y, scale):
        nonlocal k
        Y2 = emu.reverse_once(info, Y, scale, o["z"][k])
        np.testing.assert_allclose(Y2, o["nodes"][k], atol=1e-9)
        k += 1
        return Y2

    for i in range(cfg.Ndiffuse - 1, 0, -1):
        Y = anneal(info, Y, np.full(H1, sigmas[i]))
    for t in range(o["meta"]["n_steps"]):
        np.testing.assert_allclose(Y[0], o["actions"][t], atol=1e-9)
        r, info = emu.step(info, Y[0].copy())
        np.testing.assert_allclose(emu.d.qpos, o["qpos"][t], atol=1e-9)
        np.testing.assert_allclose(r, o["reward"][t], atol=1e-9)
        Y = emu.shift_m @ Y
        for i in range(cfg.Ndiffuse):
            Y = anneal(info, Y, emu.sigma_control * cfg.traj_diffuse_factor**i)
    assert k == o["meta"]["n_anneals"]


# ----------------------------------------------------------------------
def _drive_jax_vs_oracle(cfg, env, o, resync=False):
    """Run the JAX compat path along the binary's driver flow.

    resync=False: free-run (Y and physics evolve on the JAX side; the
    injected noise is the binary's).  resync=True: before every anneal and
    every executed step, adopt the binary's physics state and (for anneals)
    its warm trajectory afterwards — isolating the per-decision function at
    benchmark scale, where free-running Q1 chains (65 candidates x 26
    contact steps per anneal) are provably chaotic across engines.

    Returns dict with per-anneal JAX nodes/rews and per-step actions/qpos.
    """
    import jax
    import jax.numpy as jnp

    from tpu_dialmpc.planner.dial import MBDPI

    mbdpi = MBDPI(cfg, env)
    dtype = jnp.float64
    state0 = env.reset(jax.random.PRNGKey(0))

    @jax.jit
    def anneal(phys, info, Y, scale, noise):
        s = mbdpi._restore(state0, (*phys, info))
        return mbdpi.reverse_once_compat(
            s, jax.random.PRNGKey(0), Y, scale, noise=noise
        )

    @jax.jit
    def exec_step(phys, info, a):
        s = mbdpi._restore(state0, (*phys, info))
        s2 = env.step(s, a)
        lean = mbdpi._lean(s2)
        return lean[:3], s2.info, s2.reward

    H1 = cfg.Hnode + 1
    sigmas = mbdpi.sigmas
    phys = mbdpi._lean(state0)[:3]
    info = state0.info
    Y = jnp.zeros((H1, NU), dtype)
    out = {
        "nodes": [], "rews": [], "weights": [],
        "actions": [], "qpos": [], "reward": [],
    }
    k = 0

    def one_anneal(phys, info, Y, scale):
        nonlocal k
        if resync:
            q, v, w = _split_phys(o["phys_in"][k])
            phys = (jnp.asarray(q, dtype), jnp.asarray(v, dtype), jnp.asarray(w, dtype))
        Y2, inf, phys2 = anneal(
            phys, info, Y, jnp.asarray(scale, dtype), jnp.asarray(o["z"][k], dtype)
        )
        out["nodes"].append(np.asarray(Y2, np.float64))
        out["rews"].append(np.asarray(inf.rews, np.float64))
        out["weights"].append(np.asarray(inf.weights, np.float64))
        if resync:
            Y2 = jnp.asarray(o["nodes"][k], dtype)
        k += 1
        return phys2, Y2

    if o["meta"]["warmstart"]:
        for i in range(cfg.Ndiffuse - 1, 0, -1):
            phys, Y = one_anneal(phys, info, Y, np.full(H1, sigmas[i]))
    for t in range(o["meta"]["n_steps"]):
        a = np.asarray(Y[0])
        out["actions"].append(a)
        if resync:
            q, v, w = _split_phys(o["exec_in"][t])
            phys = (
                jnp.asarray(q, dtype),
                jnp.asarray(v, dtype),
                jnp.asarray(w, dtype),
            )
            a = o["actions"][t]
        phys, info, rew = exec_step(
            phys, info, jnp.asarray(a, dtype)
        )
        out["qpos"].append(np.asarray(phys[0], np.float64))
        out["reward"].append(float(rew))
        Y = mbdpi.shift(Y)
        n_diffuse = cfg.Ndiffuse_init if t == 0 else cfg.Ndiffuse
        for i in range(n_diffuse):
            scale = mbdpi.sigma_control * cfg.traj_diffuse_factor**i
            phys, Y = one_anneal(phys, info, Y, scale)
    return {kk: np.stack(v) for kk, v in out.items()}


def _parity_env():
    from test_reference_parity import _parity_env as pe

    return pe()


@pytest.mark.slow
def test_jax_compat_matches_compiled_reference_toy(oracle_toy):
    """Free-running JAX compat path vs the binary: executed controls and
    node trajectories inside the 1e-3 north-star budget (measured ~1e-6
    at this float64 toy shape), including the warm-start `reverse`."""
    o = oracle_toy
    cfg = _cfg(Hsample=5, Hnode=2, Nsample=6)
    j = _drive_jax_vs_oracle(cfg, _parity_env(), o, resync=False)
    np.testing.assert_allclose(j["actions"], o["actions"], atol=1e-3)
    np.testing.assert_allclose(j["nodes"], o["nodes"], atol=1e-3)
    # float64 agreement is far tighter than the budget; qpos is diagnostic
    np.testing.assert_allclose(j["actions"], o["actions"], atol=1e-5)
    np.testing.assert_allclose(j["qpos"], o["qpos"], atol=1e-2)


@pytest.fixture(scope="module")
def oracle_benchmark(scene_xml, tmp_path_factory):
    return pn.run_shim(
        tmp_path_factory.mktemp("bench"), scene_xml,
        Hsample=25, Hnode=5, Nsample=64, Ndiffuse=2, Ndiffuse_init=10,
        n_steps=10, seed=0, warmstart=False,
    )


@pytest.mark.slow
def test_jax_matches_compiled_reference_benchmark_scale(oracle_benchmark):
    """Per-decision parity vs the binary at benchmark geometry and the
    REFERENCE temperature (0.05, score_std="time", compat_q1) — the regime
    the round-2 audit flagged as untested.

    Every anneal adopts the binary's entry state and warm trajectory, so
    each comparison is one decision: identical inputs through 65 Q1-chained
    26-step rollouts on two engines.  Assertions encode the argmax structure
    of temp=0.05 softmax (weights concentrate on one candidate):
      - per-candidate mean rewards agree (median over anneals ~1e-6; a
        bounded tail where a rollout grazes a contact bifurcation),
      - the selected (argmax) candidate matches on >=90% of anneals,
      - node trajectories agree within 1e-3 on every anneal whose top-2
        logit gap exceeds 1 (clear decisions), and within 5e-2 always.
    """
    o = oracle_benchmark
    cfg = _cfg(Hsample=25, Hnode=5, Nsample=64, Ndiffuse_init=10)
    j = _drive_jax_vs_oracle(cfg, _parity_env(), o, resync=True)

    rew_diff = np.abs(j["rews"] - o["rews"]).max(axis=1)
    print("per-anneal reward diff: median", np.median(rew_diff),
          "p90", np.quantile(rew_diff, 0.9), "max", rew_diff.max())
    assert np.median(rew_diff) < 1e-4, rew_diff
    assert (rew_diff < 1e-3).mean() >= 0.8, rew_diff

    jx = j["rews"].argmax(axis=1)
    ox = o["rews"].argmax(axis=1)
    match = (jx == ox).mean()
    print("argmax candidate match rate:", match)
    assert match >= 0.9, (match, list(zip(jx, ox)))

    # decision-clarity gap straight from the softmax weights the update
    # used (the C++ time-std scoring, dial-core.h:529-570, is baked into
    # them): log(w_top1 / w_top2) is the top-2 logit gap
    node_diff = np.abs(j["nodes"] - o["nodes"]).max(axis=(1, 2))
    w_sorted = np.sort(j["weights"], axis=1)
    gaps = np.log(w_sorted[:, -1] + 1e-300) - np.log(w_sorted[:, -2] + 1e-300)
    clear = gaps > 1.0
    print("node diff: clear-gap max", node_diff[clear].max(),
          "(n_clear=", int(clear.sum()), "/", len(clear), ") overall max",
          node_diff.max())
    assert node_diff[clear].max() < 1e-3, node_diff[clear]
    assert node_diff.max() < 5e-2, node_diff

    # executed steps are resynced to the binary's state: rewards and
    # post-step qpos are then one-env-step quantities
    np.testing.assert_allclose(j["reward"], o["reward"], atol=1e-6)
    np.testing.assert_allclose(j["qpos"], o["qpos"], atol=1e-6)


@pytest.fixture(scope="module")
def oracle_reference_batch(scene_xml, tmp_path_factory):
    # the reference benchmark's OWN batch size (dial-core-test.cpp:11:
    # Nsample=2048) at benchmark geometry — ~0.77M sequential mj_steps in
    # the C++ driver, the literal north-star workload
    return pn.run_shim(
        tmp_path_factory.mktemp("refbatch"), scene_xml,
        Hsample=25, Hnode=5, Nsample=2048, Ndiffuse=2, Ndiffuse_init=10,
        n_steps=3, seed=0, warmstart=False,
    )


@pytest.mark.slow
def test_jax_matches_compiled_reference_full_batch(oracle_reference_batch):
    """Per-decision parity vs the binary at the reference's OWN sample count
    (Nsample=2048, dial-core-test.cpp:11) — the round-3 audit's missing
    workload: at 2048 the softmax is far sharper (temp 0.05 over 2049
    candidates) and the Q1 chain is 32x longer than the Nsample=64 test.

    Same resync harness as benchmark-scale: every anneal adopts the
    binary's entry state and warm trajectory, so each comparison is one
    decision over identical inputs (2049 Q1-chained 26-step rollouts).
    14 anneals = 10 (Ndiffuse_init at t=0) + 2 + 2.

    What agreement MEANS at this chain length (measured structure, round
    4): the Q1 chain threads one mjData through all 2049 candidates, so a
    single contact bifurcation (f64 round-off on a grazing contact,
    amplified by chaotic dynamics) poisons the starting state of every
    LATER candidate.  At high noise scales that happens almost every
    anneal somewhere in the 53k-step chain — measured: per-anneal
    agreement is exact (max ≤9.3e-4, typically ≪1e-4) for every candidate
    BEFORE the first bifurcation, divergent after; the 7 annealed-down
    iterations of t=0 are clean end-to-end.  The asserted invariants are
    therefore chain-structured agreement + the decision-level outputs:
    the argmax candidate, the node update (exactly equal when argmax
    matches — temp 0.05 concentrates the weights), and the executed
    steps (machine precision)."""
    o = oracle_reference_batch
    assert o["meta"]["Nsample"] == 2048 and o["meta"]["n_anneals"] == 14
    cfg = _cfg(Hsample=25, Hnode=5, Nsample=2048, Ndiffuse_init=10)
    j = _drive_jax_vs_oracle(cfg, _parity_env(), o, resync=True)

    diff = np.abs(j["rews"] - o["rews"])  # (14, 2049)
    print("per-candidate reward diff: median", np.median(diff),
          "p90", np.quantile(diff, 0.9))
    assert np.median(diff) < 1e-5, np.median(diff)

    # chain-structured agreement: exact prefix up to the first bifurcation
    n_clean = 0
    for a in range(diff.shape[0]):
        bad = np.where(diff[a] > 1e-3)[0]
        first = bad[0] if len(bad) else diff.shape[1]
        prefix_max = diff[a, :first].max() if first else 0.0
        assert prefix_max < 1e-2, (a, first, prefix_max)
        n_clean += len(bad) == 0
    print("clean anneals (no bifurcation in 53k chained steps):", n_clean)
    assert n_clean >= 4  # the annealed-down t=0 iterations stay clean

    jx = j["rews"].argmax(axis=1)
    ox = o["rews"].argmax(axis=1)
    match = (jx == ox).mean()
    print("argmax candidate match rate:", match)
    assert match >= 0.7, (match, list(zip(jx, ox)))

    # temp 0.05 concentrates weights on the argmax candidate, whose nodes
    # are the injected noise (identical on both sides): matching anneals
    # must produce the IDENTICAL node update
    node_diff = np.abs(j["nodes"] - o["nodes"]).max(axis=(1, 2))
    agree = jx == ox
    print("node diff on argmax-matching anneals:", node_diff[agree].max())
    assert node_diff[agree].max() < 1e-9, node_diff[agree]

    np.testing.assert_allclose(j["reward"], o["reward"], atol=1e-9)
    np.testing.assert_allclose(j["qpos"], o["qpos"], atol=1e-9)
