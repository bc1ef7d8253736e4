"""Full-loop parity: JAX planner in reference-compat mode vs a numpy/mujoco
emulator of the C++ reference semantics.

The emulator reproduces, on the CPU MuJoCo oracle, exactly what the reference
binary computes (SURVEY §2.5 quirks included):
 - Q1: one shared mutable mjData across candidate rollouts (candidate i starts
   from candidate i-1's terminal state) — dial-core.h:443-456;
 - Q2: one mj_step of timestep 0.0025 per control — unitree-go2-env.h:433;
 - "ref"-mode spline (halved curvature + duplicated tail slope);
 - PD torque map, ramped commands, Go2 reward stack (unitree-go2-env.h:418-600).
The one intentional divergence is yaw extraction (standard atan2 instead of
Eigen's [0,π]-clamped eulerAngles; see core/rotations.py) — both sides here
use atan2.

Identical noise is injected into both sides; executed control sequences must
match within the 1e-3 north-star budget (float64: they match to ~1e-6).
"""

import dataclasses

import jax
import jax.numpy as jnp
import mujoco
import numpy as np

from tpu_dialmpc.core import spline
from tpu_dialmpc.dynamics import assets
from tpu_dialmpc.envs import get_env
from tpu_dialmpc.planner.dial import DialConfig, MBDPI


def _quat_rotate_np(v, q):
    s, u = q[0], q[1:]
    return 2 * u * (u @ v) + (s * s - u @ u) * v + 2 * s * np.cross(u, v)


class RefEmulator:
    """Numpy/mujoco emulation of UnitreeGo2Env + MBDPI per the C++ behavior."""

    def __init__(self, cfg: DialConfig, vx=0.8, kp=30.0, kd=0.65):
        self.cfg = cfg
        self.m = assets.load_mj_model("go2_force")
        self.m.opt.timestep = 0.0025
        self.d = mujoco.MjData(self.m)
        self.vx, self.kp, self.kd = vx, kp, kd
        self.torso = mujoco.mj_name2id(self.m, mujoco.mjtObj.mjOBJ_BODY, "base")
        self.feet = [
            mujoco.mj_name2id(self.m, mujoco.mjtObj.mjOBJ_SITE, s)
            for s in ("FL_foot", "FR_foot", "RL_foot", "RR_foot")
        ]
        self.joint_range = self.m.jnt_range[1:13].copy()
        self.n2u = spline.node2u_matrix(cfg.Hnode, cfg.Hsample, cfg.ctrl_dt, "ref")
        tmax = cfg.ctrl_dt * cfg.Hsample
        self.sigma_control = cfg.horizon_diffuse_factor ** np.arange(
            cfg.Hnode, -1, -1
        )
        self.u2n = spline.u2node_matrix(cfg.Hnode, cfg.Hsample, cfg.ctrl_dt, "ref")
        self.shift_m = spline.shift_matrix(cfg.Hnode, cfg.Hsample, cfg.ctrl_dt, "ref")

    def reset(self):
        mujoco.mj_resetData(self.m, self.d)
        self.d.qpos[:] = self.m.key_qpos[0]
        self.d.qvel[:] = 0
        mujoco.mj_forward(self.m, self.d)
        return {"vel_tar": np.zeros(3), "ang_vel_tar": np.zeros(3), "step": 0}

    def act2tau(self, act):
        jr = self.joint_range
        act_n = (act + 1.0) / 2.0
        target = jr[:, 0] + act_n * (jr[:, 1] - jr[:, 0])
        target = np.clip(target, jr[:, 0], jr[:, 1])
        q = self.d.qpos[7:19]
        qd = self.d.qvel[6:18]
        return self.kp * (target - q) - self.kd * qd

    def step(self, info, action):
        """One env step per unitree-go2-env.h:418-600 (single mj_step, Q2)."""
        self.d.ctrl[:] = self.act2tau(action)
        mujoco.mj_step(self.m, self.d)
        info = dict(info)
        dt = self.m.opt.timestep
        frac = info["step"] * dt / 1.0
        info["vel_tar"] = np.array(
            [min(self.vx * frac, self.vx), 0.0, 0.0]
        )
        info["ang_vel_tar"] = np.zeros(3)

        d = self.d
        z_feet = np.array([d.site_xpos[f][2] for f in self.feet])
        z_feet_tar = np.zeros(4)  # gait=stand: amplitude 0
        reward_gaits = -np.sum(((z_feet_tar - z_feet) / 0.05) ** 2)
        quat = d.xquat[self.torso].copy()
        up = np.array([0.0, 0.0, 1.0])
        up_body = _quat_rotate_np(up, quat)
        reward_upright = -np.sum((up_body - up) ** 2)
        yaw = np.arctan2(
            2 * (quat[0] * quat[3] + quat[1] * quat[2]),
            1 - 2 * (quat[2] ** 2 + quat[3] ** 2),
        )
        yaw_tar = 0.0
        wrapped = np.arctan2(np.sin(yaw - yaw_tar), np.cos(yaw - yaw_tar))
        reward_yaw = -(wrapped**2)
        offset = d.xpos[self.torso] - d.subtree_com[self.m.body_rootid[self.torso]]
        cvel = d.cvel[self.torso]
        ang, lin = cvel[:3], cvel[3:]
        vel_lin = lin - np.cross(offset, ang)
        vb = _quat_rotate_np(vel_lin, quat * np.array([1, -1, -1, -1]))
        ab = _quat_rotate_np(ang, quat * np.array([1, -1, -1, -1]))
        reward_vel = -np.sum((vb[:2] - info["vel_tar"][:2]) ** 2)
        reward_ang_vel = -((ab[2] - info["ang_vel_tar"][2]) ** 2)
        reward_height = -((d.xpos[self.torso][2] - 0.3) ** 2)
        reward = (
            0.1 * reward_gaits
            + 0.5 * reward_upright
            + 0.3 * reward_yaw
            + 1.0 * reward_vel
            + 1.0 * reward_ang_vel
            + 1.0 * reward_height
        )
        info["step"] += 1
        return reward, info

    def reverse_once(self, info, Ybar, noise_scale, noise):
        """dial-core.h:469-593 with Q1 shared-state rollouts."""
        cfg = self.cfg
        cands = Ybar[None] + noise * noise_scale[None, :, None]
        cands[:, 0, :] = Ybar[0]
        all_y = np.concatenate([cands, Ybar[None]], 0)
        all_y = np.clip(all_y, -1, 1)
        all_us = np.einsum("qn,snu->squ", self.n2u, all_y)
        rewss = np.zeros((all_y.shape[0], cfg.Hsample + 1))
        # Q1: ONE shared mjData; no state restore between candidates
        for s in range(all_y.shape[0]):
            inf = dict(info)
            for t in range(cfg.Hsample + 1):
                rewss[s, t], inf = self.step(inf, all_us[s, t])
        mean = rewss.mean(-1)
        rew_ybar = rewss[-1].mean()
        var = ((rewss - mean[:, None]) ** 2).mean(-1)
        std = np.where(var > 1e-14, np.sqrt(var), 1e-7)
        logp0 = (mean - rew_ybar) / (std * cfg.temp_sample)
        w = np.exp(logp0 - logp0.max())
        w /= w.sum()
        return np.einsum("s,snu->nu", w, all_y)


def test_reverse_once_matches_reference_emulator():
    cfg = DialConfig(
        Hsample=5, Hnode=2, Nsample=6, ctrl_dt=0.02, temp_sample=0.05,
        compat_q1=True, spline_mode="ref", score_std="time",
    )
    # --- emulator side ---
    emu = RefEmulator(cfg)
    info = emu.reset()
    rng = np.random.default_rng(0)
    noise = rng.standard_normal((cfg.Nsample, cfg.Hnode + 1, 12))
    Ybar = rng.uniform(-0.3, 0.3, (cfg.Hnode + 1, 12))
    scale = np.full(cfg.Hnode + 1, 0.2)
    # snapshot the emulator state before rollouts — the JAX side starts here
    qpos0, qvel0 = emu.d.qpos.copy(), emu.d.qvel.copy()
    want = emu.reverse_once(info, Ybar.copy(), scale, noise.copy())

    # --- JAX side (float64, compat mode) ---
    env = get_env(
        "go2_stand", n_substeps=1, dtype="float64", ramp_up_time=1.0,
        default_vx=0.8, kp=30.0, kd=0.65, joint_range_source="model",
    )
    mbdpi = MBDPI(cfg, env)
    state = env.reset(jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(state.pipeline.qpos), qpos0, atol=1e-12)
    got, _ = mbdpi.reverse_once(
        state,
        jax.random.PRNGKey(1),
        jnp.asarray(Ybar),
        jnp.asarray(scale),
        noise=jnp.asarray(noise),
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-3)
    # float64 physics parity is far tighter than the 1e-3 budget
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_receding_horizon_controls_match_reference_emulator():
    """3 control steps of the full C++ loop semantics, including the shared
    mjData chaining across env.step AND all candidate rollouts: executed
    controls and node trajectories match within the 1e-3 budget."""
    cfg = DialConfig(
        Hsample=5, Hnode=2, Nsample=4, Ndiffuse=2, Ndiffuse_init=2,
        ctrl_dt=0.02, temp_sample=0.05, horizon_diffuse_factor=0.9,
        traj_diffuse_factor=0.5, compat_q1=True, spline_mode="ref",
        score_std="time",
    )
    emu = RefEmulator(cfg)
    env = get_env(
        "go2_stand", n_substeps=1, dtype="float64",
        default_vx=0.8, kp=30.0, kd=0.65, joint_range_source="model",
    )
    mbdpi = MBDPI(cfg, env)

    rng = np.random.default_rng(42)
    # emulator loop state (self.d is the single shared physics state)
    e_info = emu.reset()
    e_Y = np.zeros((cfg.Hnode + 1, 12))
    # jax loop state: thread the same shared-physics carry explicitly
    state0 = env.reset(jax.random.PRNGKey(0))
    phys = mbdpi._lean(state0)[:3]
    info = state0.info
    Y = jnp.zeros((cfg.Hnode + 1, 12), jnp.float64)

    for t in range(3):
        a_e = e_Y[0].copy()
        a_j = np.asarray(Y[0])
        np.testing.assert_allclose(a_j, a_e, atol=1e-3)
        # execute (from the chained physics state, like the C++)
        _, e_info = emu.step(e_info, a_e)
        s = mbdpi._restore(state0, (*phys, info))
        s2 = env.step(s, jnp.asarray(a_j))
        phys = mbdpi._lean(s2)[:3]
        info = s2.info
        # cross-engine physics drift accumulates through the chained rollouts;
        # the contract is on the *controls* (1e-3), qpos is diagnostic
        np.testing.assert_allclose(np.asarray(phys[0]), emu.d.qpos, atol=1e-2)
        # shift
        e_Y = emu.shift_m @ e_Y
        Y = mbdpi.shift(Y)
        # anneal: d keeps mutating through rollouts on both sides; the C++
        # passes the post-step EnvState's info to every reverse_once
        for i in range(cfg.Ndiffuse):
            scale = emu.sigma_control * cfg.traj_diffuse_factor**i
            noise = rng.standard_normal((cfg.Nsample, cfg.Hnode + 1, 12))
            e_Y = emu.reverse_once(e_info, e_Y, scale, noise.copy())
            s = mbdpi._restore(state0, (*phys, info))
            Y, _, phys = mbdpi.reverse_once_compat(
                s, jax.random.PRNGKey(0), Y, jnp.asarray(scale),
                noise=jnp.asarray(noise),
            )
        np.testing.assert_allclose(np.asarray(Y), e_Y, atol=1e-3)
