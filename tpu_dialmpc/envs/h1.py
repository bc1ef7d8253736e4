"""Unitree H1 humanoid environments (walk / loco / push-crate).

The reference carries H1 only as model assets (models/unitree_h1/*, consumed
by the upstream DIAL-MPC task suite — SURVEY §2.4); it ships no H1 env code.
This env mirrors the Go2 env's reward structure (tracking + gait + upright +
height) adapted to a biped: two feet sites, torso body "pelvis", biped gait
tables, and a standing height target read from the home keyframe.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from tpu_dialmpc.core import rotations as rot
from tpu_dialmpc.dynamics import assets, compile_model, pipeline
from tpu_dialmpc.envs import gait
from tpu_dialmpc.envs.base import EnvState, StateInfo
from tpu_dialmpc.envs.fused_rollout import FusedRolloutMixin


@dataclasses.dataclass(frozen=True)
class UnitreeH1EnvConfig:
    kp: float = 200.0
    kd: float = 5.0
    action_scale: float = 1.0
    default_vx: float = 0.0
    default_vy: float = 0.0
    default_vyaw: float = 0.0
    ramp_up_time: float = 1.0
    gait: str = "stand"
    timestep: float = 0.0025
    randomize_tasks: bool = False
    leg_control: str = "torque"
    n_substeps: int = 1
    scene: str = "h1_walk"
    pos_tar_z: float = 0.98  # pelvis height target (home keyframe height)
    dtype: str = "float32"
    fused: str = "auto"  # fused Pallas rollout kernel: "auto" | "on" | "off"
    # Action-range source. "centered" (default) builds home-centered ranges
    # home +/- action_halfwidth clipped to the model limits — the H1 model's
    # raw ranges put e.g. the shoulder-roll/yaw midpoints 1.4-1.6 rad from
    # the home pose, so act=0 would fling the arms out (the same failure mode
    # as Go2's rear thighs, see envs/go2.py joint_range_source). "model" uses
    # the raw MJCF ranges.
    joint_range_source: str = "centered"
    action_halfwidth: float = 0.7
    # Arm/torso authority (h1_walk's 19-actuator model): full ±0.7 arm range
    # lets the sampler trade balance for arm flailing — measured: h1_walk
    # falls by step ~170 with symmetric authority while the arms-fixed
    # h1_loco walks 400 steps.  Narrower arm targets keep the upper body
    # quiet without freezing it (crate pushing still needs reach).
    arm_halfwidth: float = 0.25
    # energy cost from the reference's dead-code env
    # (dial_mpc/include/UnitreeGo2Env.h:699-713; weight 0 there too)
    energy_weight: float = 0.0
    # yaw extraction — see envs/go2.py yaw_mode
    yaw_mode: str = "atan2"
    # XY position anchor: pos_tar integrates vel_tar each step and the torso
    # xy is pulled toward it.  The Go2 reward (which this env otherwise
    # mirrors) tracks velocity only; on the biped that leaves drift free —
    # measured: "stand" slid backward 5.2 m over 400 steps, and the drift
    # fights commanded forward walking until the robot falls.  H1 carries no
    # reference env (SURVEY §2.4: assets only), so this term is part of our
    # H1 design.
    pos_anchor_weight: float = 1.0
    # Anchor leash (meters; 0 = off): cap how far pos_tar may lead the torso
    # xy.  The anchor integrates vel_tar open-loop, so when the environment
    # legitimately limits progress (h1_push_crate: the 30 kg crate caps the
    # push speed well below default_vx) the error grows without bound and the
    # planner eventually trades balance for lunging into the obstacle
    # (measured: pushes the crate 1.2 m, then dives at step ~395 as the
    # anchor penalty passes -2.5).  The leash keeps a constant-magnitude
    # forward pull instead; candidate ranking is preserved (penalty is
    # monotone in distance-to-target, saturating at leash²).
    pos_anchor_leash: float = 0.0
    # Crate-task reward (h1_push_crate): reward the payload's own forward
    # velocity, clipped to ±crate_vel_cap.  Rewarding the anchor/velocity
    # alone leaves two cheaper strategies the planner measurably finds:
    # walking around the crate (leashed anchor penalty relaxes to ~0 while
    # the crate never moves) and dive-shoving (a terminal lunge spikes crate
    # velocity, but the clip means speed beyond the cap earns nothing, so a
    # steady sub-cap push accumulates more).  0 disables; binds only when the
    # scene has an unactuated slide joint (the crate's dof).
    crate_vel_weight: float = 0.0
    crate_vel_cap: float = 0.3
    # Anchor mode: "integrate" marches pos_tar by vel_tar open-loop (leashed
    # above); "crate" anchors it to the crate's own position minus
    # crate_standoff — the target then advances exactly as fast as the crate
    # is actually pushed, walking past/around the crate is penalized (the
    # target stays at the crate), and no leash is needed (the error is
    # bounded by geometry).  Requires a crate dof; falls back to "integrate"
    # without one.
    pos_anchor_mode: str = "integrate"
    # torso-to-crate-center distance held in "crate" mode: 0.6 (box half
    # extent) + ~0.15 torso standoff behind the near face
    crate_standoff: float = 0.75
    # Termination-as-constraint (same mechanism as envs/go2.py done_penalty):
    # subtract done_penalty per flagged rollout step so candidates that fall
    # (or graze physical joint limits / the z<0.5 floor) price the violation
    # inside the sampler instead of being filtered only at execution time.
    # Motivation (round 4): after the capsule-box contact-dedup fix made
    # crate contact forces match MuJoCo exactly, the h1_push_crate planner
    # found a dive-and-shove strategy — crate +1.87 m but pelvis down at
    # 0.17 m for the last 2 s.  Applies identically in the executed step and
    # both rollout paths (everything funnels through _post_physics).
    done_penalty: float = 0.0


class UnitreeH1Env(FusedRolloutMixin):
    FEET_SITES = ("left_foot", "right_foot")
    TORSO_BODY = "pelvis"

    def __init__(self, config: UnitreeH1EnvConfig = UnitreeH1EnvConfig()):
        self.config = config
        mj = assets.load_mj_model(config.scene)
        mj.opt.timestep = config.timestep
        self.mj_model = mj  # host model for rendering/FK tools (see go2.py)
        self.model = compile_model(mj).with_options(timestep=config.timestep)
        self._torso_idx = self.model.body_names.index(self.TORSO_BODY)
        self._feet_site_id = np.array(
            [self.model.site_names.index(s) for s in self.FEET_SITES]
        )
        key_qpos = self.model.key_qpos.get("home", np.array(self.model.qpos0))
        self._init_q = np.asarray(key_qpos)
        # actuated hinge joints (exclude non-actuated extras like the crate's
        # slide dof): map actuator -> (jnt qposadr, dofadr, range)
        dof_to_jnt = {int(self.model.jnt_dofadr[j]): j for j in range(self.model.njnt)}
        self._act_jnt = [dof_to_jnt[int(d)] for d in self.model.actuator_dofadr]
        self._act_qadr = np.array(
            [int(self.model.jnt_qposadr[j]) for j in self._act_jnt]
        )
        self._act_dadr = np.array(self.model.actuator_dofadr)
        model_range = np.asarray(self.model.jnt_range)[self._act_jnt]
        # actuated-joint names (for per-group action authority)
        import mujoco as _mj

        self._act_jnt_names = [
            _mj.mj_id2name(mj, _mj.mjtObj.mjOBJ_JOINT, int(j)) or ""
            for j in self._act_jnt
        ]
        if config.joint_range_source == "centered":
            # symmetric about home so act=0 targets exactly the home pose
            # (an asymmetric clip would re-introduce the midpoint bias)
            home_j = self._init_q[self._act_qadr]
            halfwidth = np.array(
                [
                    config.arm_halfwidth
                    if any(k in n for k in ("shoulder", "elbow", "torso"))
                    else config.action_halfwidth
                    for n in self._act_jnt_names
                ]
            )
            w = np.minimum(
                halfwidth,
                np.minimum(home_j - model_range[:, 0], model_range[:, 1] - home_j),
            )
            w = np.maximum(w, 0.05)
            self.joint_range = np.stack(
                [
                    np.maximum(home_j - w, model_range[:, 0]),
                    np.minimum(home_j + w, model_range[:, 1]),
                ],
                axis=1,
            )
        else:
            self.joint_range = model_range
        self.physical_joint_range = model_range.copy()
        cr = np.asarray(self.model.actuator_ctrlrange)
        unlimited = np.all(np.abs(cr) < 1e-6, axis=1)
        self.joint_torque_range = np.where(
            unlimited[:, None], np.array([[-np.inf, np.inf]]), cr
        )
        g = config.gait if config.gait in gait.BIPED_GAIT_PHASES else "walk"
        self._gait_phases = np.array(gait.BIPED_GAIT_PHASES[g])
        self._gait_params = np.array(gait.BIPED_GAIT_PARAMS[g])
        self._dtype = jnp.float32 if config.dtype == "float32" else jnp.float64
        # Foot-geometry-derived contact threshold (the Go2 form
        # `z_site - r < 1e-3`, envs/go2.py): H1's foot sites sit at the
        # capsule sole, so the ground-contact site height is read off the
        # home keyframe instead of a sphere radius.
        _d = _mj.MjData(mj)
        _d.qpos[:] = self._init_q[: mj.nq]
        _mj.mj_forward(mj, _d)
        self._foot_contact_z = np.array(
            [_d.site_xpos[int(s)][2] for s in self._feet_site_id]
        )
        # unactuated slide joint = the crate's dof (push-crate scenes); None
        # on crate-free scenes, which keeps crate_vel_weight inert there
        from tpu_dialmpc.dynamics.model import JNT_SLIDE

        act_dofs = {int(d) for d in self.model.actuator_dofadr}
        free_slides = [
            j
            for j in range(self.model.njnt)
            if int(self.model.jnt_type[j]) == JNT_SLIDE
            and int(self.model.jnt_dofadr[j]) not in act_dofs
        ]
        if free_slides:
            self._crate_dof = int(self.model.jnt_dofadr[free_slides[0]])
            self._crate_qadr = int(self.model.jnt_qposadr[free_slides[0]])
        else:
            self._crate_dof = None
            self._crate_qadr = None

    @property
    def action_size(self) -> int:
        return self.model.nu

    @property
    def observation_size(self) -> int:
        # [vel_tar(3), ang_vel_tar(3), ctrl(nu), qpos(nq), vb(3), ab(3),
        #  qvel[6:]] — the same layout as Go2's (dead-code env
        #  dial_mpc/include/UnitreeGo2Env.h:576-639 with the segment bug
        #  fixed), sized for this model's dofs
        return 6 + self.model.nu + self.model.nq + 6 + (self.model.nv - 6)

    @property
    def dt(self) -> float:
        return self.config.timestep * self.config.n_substeps

    def reset(self, rng: jnp.ndarray) -> EnvState:
        dtype = self._dtype
        qpos = jnp.asarray(self._init_q, dtype)
        qvel = jnp.zeros(self.model.nv, dtype)
        ps = pipeline.init(self.model, qpos, qvel)
        n_feet = len(self.FEET_SITES)
        info = StateInfo(
            rng=rng,
            pos_tar=jnp.array([0.0, 0.0, self.config.pos_tar_z], dtype),
            vel_tar=jnp.zeros(3, dtype),
            ang_vel_tar=jnp.zeros(3, dtype),
            yaw_tar=jnp.asarray(0.0, dtype),
            step=jnp.asarray(0, jnp.int32),
            z_feet=jnp.zeros(n_feet, dtype),
            z_feet_tar=jnp.zeros(n_feet, dtype),
            last_contact=jnp.zeros(n_feet, bool),
            feet_air_time=jnp.zeros(n_feet, dtype),
        )
        obs = self._get_obs(ps, info, jnp.zeros(self.model.nu, dtype))
        return EnvState(
            pipeline=ps,
            obs=obs,
            reward=jnp.asarray(0.0, dtype),
            done=jnp.asarray(False),
            info=info,
        )

    def act2joint(self, act: jnp.ndarray) -> jnp.ndarray:
        jr = jnp.asarray(self.joint_range, act.dtype)
        pr = jnp.asarray(self.physical_joint_range, act.dtype)
        act_normalized = (act * self.config.action_scale + 1.0) / 2.0
        targets = jr[:, 0] + act_normalized * (jr[:, 1] - jr[:, 0])
        return jnp.clip(targets, pr[:, 0], pr[:, 1])

    def act2tau(self, act: jnp.ndarray, ps: pipeline.PipelineState) -> jnp.ndarray:
        q = ps.qpos[self._act_qadr]
        qd = ps.qvel[self._act_dadr]
        target = self.act2joint(act)
        tau = self.config.kp * (target - q) - self.config.kd * qd
        tr = jnp.asarray(self.joint_torque_range, act.dtype)
        return jnp.clip(tau, tr[:, 0], tr[:, 1])

    def sample_command(self, rng: jnp.ndarray):
        k1, k2, k3 = jax.random.split(rng, 3)
        lx = jax.random.uniform(k1, (), minval=-1.0, maxval=1.0)
        ly = jax.random.uniform(k2, (), minval=-0.5, maxval=0.5)
        yw = jax.random.uniform(k3, (), minval=-1.0, maxval=1.0)
        dtype = self._dtype
        return jnp.array([lx, ly, 0.0], dtype), jnp.array([0.0, 0.0, yw], dtype)

    def _act2tau_qv(self, act, q, qd):
        target = self.act2joint(act)
        tau = self.config.kp * (target - q) - self.config.kd * qd
        tr = jnp.asarray(self.joint_torque_range, act.dtype)
        return jnp.clip(tau, tr[:, 0], tr[:, 1])

    def _ctrl_batch(self, action, qpos, qvel):
        if self.config.leg_control == "position":
            return jax.vmap(self.act2joint)(action)
        return jax.vmap(
            lambda a, q, qd: self._act2tau_qv(
                a, q[self._act_qadr], qd[self._act_dadr]
            )
        )(action, qpos, qvel)

    def step(self, state: EnvState, action: jnp.ndarray) -> EnvState:
        cfg = self.config
        dtype = self._dtype
        action = jnp.asarray(action, dtype)

        if cfg.leg_control == "position":
            ctrl = self.act2joint(action)
        else:
            ctrl = self.act2tau(action, state.pipeline)
        ps = pipeline.step(self.model, state.pipeline, ctrl, cfg.n_substeps)

        b = self._torso_idx
        reward, done, new_info = self._post_physics(
            qpos=ps.qpos,
            qvel=ps.qvel,
            site_xpos=ps.site_xpos,
            torso_xpos=ps.xpos[b],
            torso_xquat=ps.xquat[b],
            torso_cvel=ps.cvel[b],
            root_com=ps.subtree_com[int(self.model.body_rootid[b])],
            qfrc_actuator=ps.qfrc_actuator,
            info=state.info,
            ctrl=ctrl,
        )
        obs = self._get_obs(ps, new_info, ctrl)
        return EnvState(
            pipeline=ps,
            obs=obs,
            reward=jnp.asarray(reward, dtype),
            done=done,
            info=new_info,
        )

    def _post_physics(
        self,
        qpos,
        qvel,
        site_xpos,
        torso_xpos,
        torso_xquat,
        torso_cvel,
        root_com,
        qfrc_actuator,
        info: StateInfo,
        ctrl,
    ):
        """Biped reward/termination/info stack (Go2 structure adapted)."""
        cfg = self.config
        dtype = self._dtype
        rng, cmd_rng = jax.random.split(info.rng)

        if cfg.randomize_tasks:
            do_rand = (info.step % 500) == 0
            new_vel, new_ang = self.sample_command(cmd_rng)
            vel_tar = jnp.where(do_rand, new_vel, info.vel_tar)
            ang_vel_tar = jnp.where(do_rand, new_ang, info.ang_vel_tar)
        else:
            t = info.step.astype(dtype) * self.dt
            frac = t / cfg.ramp_up_time
            vel_tar = info.vel_tar.at[0].set(
                jnp.minimum(cfg.default_vx * frac, cfg.default_vx)
            )
            vel_tar = vel_tar.at[1].set(
                jnp.minimum(cfg.default_vy * frac, cfg.default_vy)
            )
            ang_vel_tar = info.ang_vel_tar.at[2].set(
                jnp.minimum(cfg.default_vyaw * frac, cfg.default_vyaw)
            )

        z_feet = site_xpos[self._feet_site_id, 2]
        duty, cadence, amplitude = self._gait_params
        phases = jnp.asarray(self._gait_phases, dtype)
        t_now = info.step.astype(dtype) * self.dt
        z_feet_tar = gait.get_foot_step(
            duty, cadence, amplitude, phases, t_now
        ).astype(dtype)
        reward_gaits = -jnp.sum(((z_feet_tar - z_feet) / 0.05) ** 2)

        up_global = jnp.array([0.0, 0.0, 1.0], dtype)
        up_body = rot.rotate(up_global, torso_xquat)
        reward_upright = -jnp.sum((up_body - up_global) ** 2)

        yaw_tar = info.yaw_tar + ang_vel_tar[2] * self.dt * info.step.astype(dtype)
        if cfg.yaw_mode == "eigen":
            yaw = rot.quat_to_yaw_eigen(torso_xquat)
        else:
            yaw = rot.quat_to_yaw(torso_xquat)
        d_yaw = yaw - yaw_tar
        wrapped = jnp.arctan2(jnp.sin(d_yaw), jnp.cos(d_yaw))
        reward_yaw = -(wrapped**2)

        vb, ab = self._body_velocities(
            torso_xpos, torso_xquat, torso_cvel, root_com
        )
        reward_vel = -jnp.sum((vb[:2] - vel_tar[:2]) ** 2)
        reward_ang_vel = -((ab[2] - ang_vel_tar[2]) ** 2)

        z_torso = torso_xpos[2]
        reward_height = -((z_torso - info.pos_tar[2]) ** 2)

        # position-anchor target (see pos_anchor_mode in the config): either
        # anchored to the crate minus a standoff, or integrated open-loop by
        # the commanded velocity
        crate_anchored = (
            cfg.pos_anchor_mode == "crate" and self._crate_qadr is not None
        )
        if crate_anchored:
            pos_tar = jnp.stack(
                [
                    qpos[self._crate_qadr]
                    - jnp.asarray(cfg.crate_standoff, dtype),
                    jnp.asarray(0.0, dtype),
                    info.pos_tar[2],
                ]
            )
        else:
            pos_tar = info.pos_tar + vel_tar * jnp.asarray(self.dt, dtype)
        # leash gates on the branch that actually ran: mode="crate" on a
        # crate-free scene falls back to the open-loop integrator above,
        # which is exactly the case an explicitly configured leash must
        # bound (the crate anchor is self-bounding, so it skips the leash)
        if not crate_anchored and cfg.pos_anchor_leash > 0.0:
            err = pos_tar[:2] - torso_xpos[:2]
            n = jnp.sqrt(jnp.sum(err**2))
            scale = jnp.minimum(
                jnp.asarray(1.0, dtype),
                jnp.asarray(cfg.pos_anchor_leash, dtype)
                / jnp.maximum(n, jnp.asarray(1e-6, dtype)),
            )
            pos_tar = pos_tar.at[:2].set(torso_xpos[:2] + err * scale)
        reward_pos = -jnp.sum((torso_xpos[:2] - pos_tar[:2]) ** 2)

        # energy term (dead-code env UnitreeGo2Env.h:699-713), config-gated
        reward_energy = jnp.asarray(0.0, dtype)
        if cfg.energy_weight != 0.0:
            tau = qfrc_actuator[6:]
            qd = qvel[6:]
            reward_energy = -jnp.sum(
                jnp.maximum(tau * qd / 160.0, 0.0) ** 2
            )

        # capped crate-velocity reward (see crate_vel_weight in the config)
        reward_crate = jnp.asarray(0.0, dtype)
        if cfg.crate_vel_weight != 0.0 and self._crate_dof is not None:
            cap = jnp.asarray(cfg.crate_vel_cap, dtype)
            reward_crate = jnp.clip(qvel[self._crate_dof], -cap, cap)

        reward = (
            0.1 * reward_gaits
            + 0.5 * reward_upright
            + 0.3 * reward_yaw
            + 1.0 * reward_vel
            + 1.0 * reward_ang_vel
            + 1.0 * reward_height
            + cfg.energy_weight * reward_energy
            + cfg.pos_anchor_weight * reward_pos
            + cfg.crate_vel_weight * reward_crate
        )

        # termination checks PHYSICAL limits, not the (narrow) action range —
        # contact forces legitimately deflect joints past home±halfwidth
        # while the robot is still upright (e.g. pushing the crate).  MuJoCo
        # joint limits are soft constraints, so normal walking overshoots
        # them by ~0.01 rad (measured: hip_roll 0.443 vs 0.43); the 0.05 rad
        # margin keeps termination for real failures, not limit compliance.
        jr = jnp.asarray(self.physical_joint_range, dtype)
        tol = jnp.asarray(0.05, dtype)
        joint_angles = qpos[self._act_qadr]
        out_of_range = jnp.any(
            (joint_angles < jr[:, 0] - tol) | (joint_angles > jr[:, 1] + tol)
        )
        done = (
            (jnp.dot(up_body, up_global) < 0.0)
            | out_of_range
            | (z_torso < 0.5)
        )
        if cfg.done_penalty != 0.0:
            # termination-as-constraint (see config docstring)
            reward = reward - cfg.done_penalty * done.astype(dtype)

        # foot-geometry contact (Go2 form envs/go2.py: site height relative
        # to its ground-contact value, derived from the home keyframe)
        contact = (
            z_feet - jnp.asarray(self._foot_contact_z, dtype)
        ) < 1e-3
        feet_air_time = jnp.where(
            contact | info.last_contact, 0.0, info.feet_air_time + self.dt
        )

        new_info = StateInfo(
            rng=rng,
            pos_tar=pos_tar,
            vel_tar=vel_tar,
            ang_vel_tar=ang_vel_tar,
            yaw_tar=info.yaw_tar,
            step=info.step + 1,
            z_feet=z_feet,
            z_feet_tar=z_feet_tar,
            last_contact=contact,
            feet_air_time=feet_air_time,
        )
        return reward, done, new_info

    def _body_velocities(self, torso_xpos, torso_xquat, torso_cvel, root_com):
        offset = torso_xpos - root_com
        cvel_ang = torso_cvel[:3]
        cvel_lin = torso_cvel[3:] - jnp.cross(offset, cvel_ang)
        return (
            rot.global_to_body_velocity(cvel_lin, torso_xquat),
            rot.global_to_body_velocity(cvel_ang, torso_xquat),
        )

    def _get_obs(self, ps, info, ctrl):
        b = self._torso_idx
        vb, ab = self._body_velocities(
            ps.xpos[b],
            ps.xquat[b],
            ps.cvel[b],
            ps.subtree_com[int(self.model.body_rootid[b])],
        )
        return jnp.concatenate(
            [info.vel_tar, info.ang_vel_tar, ctrl, ps.qpos, vb, ab, ps.qvel[6:]]
        )
