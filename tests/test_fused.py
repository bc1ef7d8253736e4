"""Fused Pallas substep kernel (dynamics/fused.py) — correctness vs the XLA
pipeline.

The fused kernel's scalar graph is executed here EAGERLY (no pallas_call, no
jit): the trace is identical to what Mosaic compiles on TPU, so comparing its
numerics against pipeline.step validates the kernel math.  (Compiling the
~15k-op graph through XLA-CPU takes minutes, and pallas interpret mode is
slower still — eager execution is the practical CPU oracle path.)

TPU execution of the same graph is exercised by bench.py / the runner.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_dialmpc.dynamics import assets, fused, pipeline
from tpu_dialmpc.dynamics.model import compile_model


def _model(scene, timestep=0.0025):
    m = assets.load_mj_model(scene)
    m.opt.timestep = timestep
    return compile_model(m).with_options(timestep=timestep)


def _rand_state(model, rng, scale_q=0.1, scale_v=0.5):
    key = model.key_qpos.get("home")
    qpos = np.array(key if key is not None else model.qpos0, dtype=np.float64)
    qpos[7:] += rng.normal(scale=scale_q, size=model.nq - 7)
    qvel = rng.normal(scale=scale_v, size=model.nv)
    ws = rng.normal(scale=scale_v, size=model.nv)
    return qpos, qvel, ws


def _run_substep_eager(model, spec, qpos, qvel, ws, ctrl):
    """Evaluate the fused scalar graph on (1,1)-shaped batch tiles."""
    meta = fused._meta(model)
    q = [jnp.asarray(qpos[i], jnp.float32).reshape(1, 1) for i in range(model.nq)]
    v = [jnp.asarray(qvel[i], jnp.float32).reshape(1, 1) for i in range(model.nv)]
    w = [jnp.asarray(ws[i], jnp.float32).reshape(1, 1) for i in range(model.nv)]
    c = [jnp.asarray(ctrl[i], jnp.float32).reshape(1, 1) for i in range(model.nu)]
    q2, v2, w2, der = fused._substep(model, meta, spec, q, v, w, c)

    def pack(xs):
        return np.array([float(jnp.asarray(x).reshape(())) for x in xs])

    return pack(q2), pack(v2), pack(w2), pack(der)


def _ref_substep(model, qpos, qvel, ws, ctrl):
    st = pipeline.PipelineState(
        qpos=jnp.asarray(qpos, jnp.float32),
        qvel=jnp.asarray(qvel, jnp.float32),
        qacc_warmstart=jnp.asarray(ws, jnp.float32),
        xpos=None, xquat=None, site_xpos=None, subtree_com=None, cvel=None,
        qfrc_actuator=None, efc_force=None,
    )
    return pipeline.step(model, st, jnp.asarray(ctrl, jnp.float32), 1)


@pytest.mark.parametrize(
    "scene,torso",
    [
        ("go2_force", "base"),
        pytest.param("h1_walk", "pelvis", marks=pytest.mark.slow),
        pytest.param("go2_force_crate", "base", marks=pytest.mark.slow),
        pytest.param("h1_push_crate", "pelvis", marks=pytest.mark.slow),
    ],
)
def test_fused_substep_matches_pipeline(scene, torso):
    model = _model(scene)
    if not fused.supported(model):
        pytest.skip(f"{scene} not fused-supported")
    spec = fused.DerivedSpec(torso_body=model.body_names.index(torso))
    rng = np.random.default_rng(0)
    for trial in range(3):
        qpos, qvel, ws = _rand_state(model, rng)
        ctrl = rng.uniform(-20, 20, size=model.nu)
        q2, v2, w2, der = _run_substep_eager(model, spec, qpos, qvel, ws, ctrl)
        ref = _ref_substep(model, qpos, qvel, ws, ctrl)
        # f32 tolerance: different but equivalent factorization orders
        np.testing.assert_allclose(q2, np.asarray(ref.qpos), atol=2e-5)
        np.testing.assert_allclose(v2, np.asarray(ref.qvel), atol=5e-4)
        # derived reward inputs
        d = fused.split_derived(model, spec, jnp.asarray(der))
        tb = spec.torso_body
        np.testing.assert_allclose(
            np.asarray(d["site_xpos"]), np.asarray(ref.site_xpos), atol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(d["torso_xquat"]), np.asarray(ref.xquat[tb]), atol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(d["torso_cvel"]), np.asarray(ref.cvel[tb]), atol=1e-3
        )
        np.testing.assert_allclose(
            np.asarray(d["qfrc_actuator"]), np.asarray(ref.qfrc_actuator), atol=1e-4
        )


def test_fused_supported_flags():
    for scene in ("go2_force", "go2_position", "h1_walk", "h1_loco",
                  "go2_force_crate", "h1_push_crate"):
        assert fused.supported(_model(scene)), scene


def test_fused_disabled_on_cpu():
    """On the CPU test backend the env must fall back to the vmap path."""
    from tpu_dialmpc.envs import get_env

    env = get_env("go2_stand", n_substeps=1)
    state = env.reset(jax.random.PRNGKey(0))
    us = jnp.zeros((3, 4, env.action_size))
    assert env.rollout_batch(state, us) is None


def test_fused_tree_ldl_solves():
    """Sparse tree LDL^T equals a dense solve on the CRB mass matrix."""
    model = _model("go2_force")
    meta = fused._meta(model)
    rng = np.random.default_rng(1)
    qpos, qvel, ws = _rand_state(model, rng)
    q = [jnp.asarray(qpos[i], jnp.float32).reshape(1, 1) for i in range(model.nq)]
    fk = fused._fk(model, q)
    M = fused._crb(model, meta, fk)
    nv = model.nv
    Md = np.zeros((nv, nv))
    for (i, j), mij in M.items():
        val = float(jnp.asarray(mij).reshape(()))
        Md[i, j] = val
        Md[j, i] = val
    y = rng.normal(size=nv)
    L, Dinv = fused.ldl_factor(M, meta.anc_strict, nv)
    x = fused.ldl_solve(L, Dinv, meta.anc_strict, [float(v) for v in y])
    x = np.array([float(jnp.asarray(v).reshape(())) for v in x])
    np.testing.assert_allclose(x, np.linalg.solve(Md, y), rtol=2e-4, atol=1e-5)
