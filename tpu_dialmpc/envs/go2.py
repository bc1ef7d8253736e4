"""Unitree Go2 quadruped environment (functional, batched).

Re-implementation of the reference UnitreeGo2Env
(dial_mpc_eigen/include/unitree-go2-env.h:247-773) over the JAX physics
pipeline.  Rewards/termination/act maps replicate the reference exactly;
divergences from the reference's accidental behaviors are config-gated:

- `n_substeps`: the reference applies each control for a single physics step
  (quirk Q2, unitree-go2-env.h:433); setting n_substeps=round(ctrl_dt/timestep)
  gives the substepped semantics of the upstream Python DIAL-MPC.
- functional state: every rollout branches from its own snapshot (fixes Q1).
- yaw extraction defaults to the standard atan2 form; `yaw_mode="eigen"`
  replicates Eigen's [0,π]-clamped eulerAngles exactly (see
  core/rotations.py:quat_to_yaw_eigen) for the C++-parity path.

Config-gated extras carried from the reference's dead-code richer env
(dial_mpc/include/UnitreeGo2Env.h): 55-dim observation vector, foot contact /
air-time tracking, energy cost term (weight 0 by default).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from tpu_dialmpc.core import rotations as rot
from tpu_dialmpc.dynamics import assets, compile_model, pipeline
from tpu_dialmpc.dynamics.model import PhysicsModel
from tpu_dialmpc.envs import gait
from tpu_dialmpc.envs.base import EnvState, StateInfo
from tpu_dialmpc.envs.fused_rollout import FusedRolloutMixin


@dataclasses.dataclass(frozen=True)
class UnitreeGo2EnvConfig:
    """Mirrors UnitreeGo2EnvConfig (unitree-go2-env.h:32-50)."""

    kp: float = 30.0
    kd: float = 1.0
    action_scale: float = 1.0
    default_vx: float = 0.0
    default_vy: float = 0.0
    default_vyaw: float = 0.0
    ramp_up_time: float = 1.0
    gait: str = "stand"
    timestep: float = 0.0025
    randomize_tasks: bool = False
    leg_control: str = "torque"  # "position" | "torque"
    # --- extensions over the reference ---
    n_substeps: int = 1  # 1 replicates reference quirk Q2
    scene: str = "go2_force"
    energy_weight: float = 0.0  # dead-code env's energy term (weight 0 there too)
    dtype: str = "float32"
    fused: str = "auto"  # fused Pallas rollout kernel: "auto" | "on" | "off"
    # Action-range source. The upstream Python dial-mpc uses narrow,
    # home-centered joint ranges (act=0 targets ~the standing pose), preserved
    # in the reference's dead-code env ("from Python snippet",
    # dial_mpc/include/UnitreeGo2Env.h:276-288). The live C++ env instead
    # reads the MODEL ranges (unitree-go2-env.h:324-331) whose rear-thigh
    # midpoint sits 1.1 rad from the home pose — act=0 then drives the rear
    # legs toward collapse, which destabilizes every gait (measured: trot
    # sinks within ~10 control steps). "upstream" (default) = the Python
    # table; "model" = hinge ranges as the C++ *intended*; "model_eigen" =
    # what the C++ *actually does* (quirk Q10, unitree-go2-env.h:324-331):
    # it reads jnt_range rows 0..11, where row 0 is the FREEJOINT's (0,0)
    # range — act[0]'s target is pinned to 0 and every other actuator gets
    # the range of the joint one slot over.  Found by the compiled-binary
    # parity oracle (tests/test_binary_parity.py); binary-parity tests pin
    # "model_eigen".
    joint_range_source: str = "upstream"
    # Which box the TERMINATION predicate checks (the C++ conflates it with
    # the action table, unitree-go2-env.h:561-589 — fine for locomotion,
    # where leaving the table means losing the gait).  "action" replicates
    # that; "physical" checks the model's hinge ranges instead (what the H1
    # env already does).  Obstacle tasks need "physical": mounting the
    # 0.30 m crate REQUIRES thigh/hip excursions outside the locomotion
    # table (measured: the mounting trajectory spends 48% of steps outside
    # it, inverted/height clean), so pricing the action box with
    # done_penalty blocks the climb, while pricing the physical box prices
    # real structural violations only.
    termination_range_source: str = "action"
    # Agility: when >0, the yaw-rate command is a square wave — vyaw flips
    # sign every `turn_period` env steps (magnitude default_vyaw, ramped at
    # start) and the yaw target INTEGRATES the commanded rate (the constant-
    # command closed form yaw_tar = vyaw·t·step the C++ uses, unitree-go2-
    # env.h:489-494, is wrong under reversals).  This is the BASELINE
    # configs[3] "fast turn" maneuver; gated by tests/test_quality_tpu via
    # the go2_turn task.
    turn_period: int = 0
    # Yaw extraction. "atan2" (default) is the standard (-π, π] yaw the
    # upstream Python uses; "eigen" replicates the C++'s Eigen
    # eulerAngles(2,1,0) first angle, which is range-clamped to [0, π]
    # (true yaw + π whenever true yaw < 0 — unitree-go2-env.h:163-170,
    # verified against Eigen bit-for-bit).  Parity tests pin "eigen".
    yaw_mode: str = "atan2"
    # Crate climbing (the reference's own obstacle scene,
    # models/unitree_go2/mjx_scene_force_crate.xml:24-28, with the
    # collision-capable robot mjx_go2_force_collision.xml:96-129).  The
    # scene's crate is a mocap body — runtime-positioned by design; the
    # XML pose puts its top face at 0.6 m (unclimbably tall for a 0.27 m
    # robot; the go2_crate task presses against it).  crate_top_z > 0
    # repositions the box at model-compile time so its top face sits at
    # the given height, and switches the reward stack terrain-aware:
    #  - each foot's gait-target height rides on the support surface under
    #    that foot's (x, y) — on the crate the swing profile is evaluated
    #    relative to the crate top, and a foot hovering over the crate at
    #    ground level is priced as a 0.3 m gait error, which steers
    #    footholds up onto the box;
    #  - the torso height target ramps from ground level to
    #    pos_tar_z + crate_top_z as the torso crosses the front edge (a
    #    linear blend over ±crate_ramp m, since the torso is extended —
    #    half the body can be over the crate while the rear feet load the
    #    ground).
    crate_top_z: float = 0.0
    # distance past the front edge over which the torso height target rises
    # to the crate top (see _post_physics; starts 5 cm before the edge)
    crate_ramp: float = 0.40
    # Override the crate's center x (0 = keep the XML's 1.3 m).  The crate
    # scene is the only reference scene with the collision-capable robot;
    # travel tasks that need flat ground with real crash contacts
    # (go2_jump) park the box far down-range instead of hitting the XML's
    # 0.6 m wall at x~1.
    crate_x: float = 0.0
    # When > 0, the forward-velocity command shuts off once the torso
    # passes goal_x (planner rollouts included): the task becomes "stand
    # here" — without it the tracker trots straight off the crate's far
    # edge.
    goal_x: float = 0.0
    # Lateral position anchor: -weight * (y - pos_tar_y)^2.  The reference
    # reward has no position term at all (velocities + height only,
    # unitree-go2-env.h:558), which is fine on flat ground; on the crate
    # task the planner discovered straddling the box's SIDE edge (drift to
    # y=-0.43 of the 0.46 half-width, left legs up / right legs hanging)
    # because lateral drift is free.  The anchor keeps the approach
    # centered on the obstacle.  0 = reference semantics.
    y_anchor_weight: float = 0.0
    # Linear-velocity reward weight (reference fixes it at 1.0,
    # unitree-go2-env.h:558).  Agility tasks that must TRAVEL while
    # satisfying an expensive gait (pronk flight phases price vertical
    # effort against tracking) can raise it so commanded progress wins
    # the trade.
    vel_weight: float = 1.0
    # Termination-as-constraint (extension; 0 = reference semantics).  The
    # reference accumulates rollout rewards straight past its own done
    # predicate (dial-core.h:423-440 never reads done), so the planner
    # happily sustains joint angles outside the narrow upstream action
    # table — measured on fast gaits as a 19-27% per-step done-flag rate,
    # every flag a front-thigh range graze (QUALITY_r03/r04).  A positive
    # penalty subtracts done_penalty per flagged rollout step, making the
    # sampler price the constraint; it applies identically in the executed
    # step and both rollout paths (everything funnels through
    # _post_physics).
    done_penalty: float = 0.0


class UnitreeGo2Env(FusedRolloutMixin):
    """Pure-functional Go2 env; all methods are jit/vmap-safe."""

    FEET_SITES = ("FL_foot", "FR_foot", "RL_foot", "RR_foot")
    TORSO_BODY = "base"

    def __init__(self, config: UnitreeGo2EnvConfig = UnitreeGo2EnvConfig()):
        self.config = config
        mj = assets.load_mj_model(config.scene)
        mj.opt.timestep = config.timestep
        self._crate = None  # (cx, cy, hx, hy, top_z) when crate_top_z > 0
        if config.crate_top_z > 0.0 or config.crate_x != 0.0:
            import mujoco

            bid = mujoco.mj_name2id(mj, mujoco.mjtObj.mjOBJ_BODY, "box_body")
            if bid < 0:
                raise ValueError(
                    f"crate_top_z/crate_x set but scene {config.scene!r} "
                    "has no 'box_body' (use the go2_force_crate scene)"
                )
            gid = int(mj.body_geomadr[bid])
            if config.crate_x != 0.0:
                mj.body_pos[bid, 0] = config.crate_x
            if config.crate_top_z > 0.0:
                half_z = float(mj.geom_size[gid, 2])
                # sink the box so its top face is at crate_top_z (the mocap
                # body is runtime-positioned by design; we bake the pose at
                # compile time — the box is static either way)
                mj.body_pos[bid, 2] = config.crate_top_z - half_z
                # the XML ships the box fully transparent (rgba ...0.0);
                # a climb video of an invisible crate is useless — make it
                # opaque on the host model (visual only, physics unchanged)
                mj.geom_rgba[gid, 3] = 1.0
                self._crate = (
                    float(mj.body_pos[bid, 0]),
                    float(mj.body_pos[bid, 1]),
                    float(mj.geom_size[gid, 0]),
                    float(mj.geom_size[gid, 1]),
                    float(config.crate_top_z),
                )
        # keep the (possibly crate-patched) host model: rendering/FK tools
        # must draw the box where the TASK put it, not where the XML parks it
        self.mj_model = mj
        self.model: PhysicsModel = compile_model(mj).with_options(
            timestep=config.timestep
        )
        self._torso_idx = self.model.body_names.index(self.TORSO_BODY)
        self._feet_site_id = np.array(
            [self.model.site_names.index(s) for s in self.FEET_SITES]
        )
        key_qpos = self.model.key_qpos.get("home")
        if key_qpos is None:
            key_qpos = np.array(self.model.qpos0)
        self._init_q = np.asarray(key_qpos)
        self._default_pose = self._init_q[7:]
        # joint limits (see joint_range_source in the config)
        hinge = [
            j for j in range(self.model.njnt) if self.model.jnt_type[j] == 3
        ]
        model_range = np.asarray(self.model.jnt_range)[hinge]
        if config.joint_range_source == "upstream" and self.model.nu == 12:
            # upstream dial-mpc table, joint order (FR, FL, RR, RL)x(hip,
            # thigh, calf) — dial_mpc/include/UnitreeGo2Env.h:276-288
            self.joint_range = np.array(
                [[-0.5, 0.5], [0.4, 1.4], [-2.3, -0.85]] * 2
                + [[-0.5, 0.5], [0.4, 1.4], [-2.3, -1.3]] * 2
            )
            self.physical_joint_range = model_range.copy()
        elif config.joint_range_source == "climb" and self.model.nu == 12:
            # upstream table widened for obstacle mounting: pulling a rear
            # foot onto a 0.30 m lip needs thigh flexion past the
            # locomotion table's [0.4, 1.4] and calf extension past its
            # rear [-2.3, -1.3] (still inside the model's physical hinge
            # ranges, which clip below).  Wider ranges also widen the
            # termination box identically, so done_penalty prices real
            # falls, not climbing postures.
            self.joint_range = np.array(
                [[-0.6, 0.6], [0.0, 2.1], [-2.6, -0.7]] * 4
            )
            self.physical_joint_range = model_range.copy()
        elif config.joint_range_source == "model_eigen":
            # quirk Q10 (see config docstring): jnt_range rows 0..nu-1 —
            # includes the freejoint's (0,0) row, shifts the hinges by one;
            # the C++ sets physical_joint_range_ = joint_range_ too
            self.joint_range = np.asarray(self.model.jnt_range)[: self.model.nu]
            self.physical_joint_range = self.joint_range.copy()
        else:
            self.joint_range = model_range
            self.physical_joint_range = model_range.copy()
        # torque limits from actuator ctrlrange; (0,0) -> unlimited
        # (unitree-go2-env.h:340-354)
        cr = np.asarray(self.model.actuator_ctrlrange)
        unlimited = np.all(np.abs(cr) < 1e-6, axis=1)
        self.joint_torque_range = np.where(
            unlimited[:, None], np.array([[-np.inf, np.inf]]), cr
        )
        self._foot_radius = 0.0175
        if config.termination_range_source == "physical":
            hinge_rows = model_range[: self.model.nu]
            self.termination_joint_range = hinge_rows.copy()
        else:
            self.termination_joint_range = None  # = action table (reference)
        gait_name = config.gait if config.gait in gait.GAIT_PHASES else "trot"
        self._gait_phases = np.array(gait.GAIT_PHASES[gait_name])
        self._gait_params = np.array(gait.GAIT_PARAMS[gait_name])
        self._dtype = jnp.float32 if config.dtype == "float32" else jnp.float64

    # ------------------------------------------------------------------
    @property
    def action_size(self) -> int:
        return self.model.nu

    @property
    def dt(self) -> float:
        """Env step duration (= timestep when n_substeps=1, reference dt())."""
        return self.config.timestep * self.config.n_substeps

    @property
    def observation_size(self) -> int:
        # [vel_tar(3), ang_vel_tar(3), ctrl(nu), qpos(nq), vb(3), ab(3),
        #  qvel[6:]] — dead-code env obs (dial_mpc/include/UnitreeGo2Env.h:576-639,
        #  with its swapped-segment bug fixed)
        return 6 + self.model.nu + self.model.nq + 6 + (self.model.nv - 6)

    # ------------------------------------------------------------------
    def reset(self, rng: jnp.ndarray) -> EnvState:
        """unitree-go2-env.h:388-413."""
        dtype = self._dtype
        qpos = jnp.asarray(self._init_q, dtype)
        qvel = jnp.zeros(self.model.nv, dtype)
        ps = pipeline.init(self.model, qpos, qvel)
        n_feet = len(self.FEET_SITES)
        info = StateInfo(
            rng=rng,
            pos_tar=jnp.array([0.282, 0.0, 0.3], dtype),
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

    # ------------------------------------------------------------------
    def act2joint(self, act: jnp.ndarray) -> jnp.ndarray:
        """unitree-go2-env.h:671-696."""
        jr = jnp.asarray(self.joint_range, act.dtype)
        pr = jnp.asarray(self.physical_joint_range, act.dtype)
        act_normalized = (act * self.config.action_scale + 1.0) / 2.0
        targets = jr[:, 0] + act_normalized * (jr[:, 1] - jr[:, 0])
        return jnp.clip(targets, pr[:, 0], pr[:, 1])

    def act2tau(self, act: jnp.ndarray, ps: pipeline.PipelineState) -> jnp.ndarray:
        """PD torque map (unitree-go2-env.h:701-735)."""
        nu = self.model.nu
        return self._act2tau_qv(act, ps.qpos[7 : 7 + nu], ps.qvel[6 : 6 + nu])

    def _act2tau_qv(self, act, q, qd):
        target = self.act2joint(act)
        tau = self.config.kp * (target - q) - self.config.kd * qd
        tr = jnp.asarray(self.joint_torque_range, act.dtype)
        return jnp.clip(tau, tr[:, 0], tr[:, 1])

    # ------------------------------------------------------------------
    def sample_command(self, rng: jnp.ndarray):
        """unitree-go2-env.h:740-753."""
        k1, k2, k3 = jax.random.split(rng, 3)
        lx = jax.random.uniform(k1, (), minval=-1.5, maxval=1.5)
        ly = jax.random.uniform(k2, (), minval=-0.5, maxval=0.5)
        yw = jax.random.uniform(k3, (), minval=-1.5, maxval=1.5)
        dtype = self._dtype
        return (
            jnp.array([lx, ly, 0.0], dtype),
            jnp.array([0.0, 0.0, yw], dtype),
        )

    def _support_z(self, x, y):
        """Support-surface height under (x, y): crate top inside the box
        footprint, ground elsewhere.  Elementwise over any shape."""
        cx, cy, hx, hy, top = self._crate
        inside = (jnp.abs(x - cx) < hx) & (jnp.abs(y - cy) < hy)
        return jnp.where(inside, jnp.asarray(top, self._dtype), 0.0)

    def _foot_step_target(self, step):
        duty, cadence, amplitude = self._gait_params
        phases = jnp.asarray(self._gait_phases, self._dtype)
        t = step.astype(self._dtype) * self.dt
        # numpy-f64 gait params would promote the result under x64
        return gait.get_foot_step(duty, cadence, amplitude, phases, t).astype(
            self._dtype
        )

    def _ctrl_batch(self, action, qpos, qvel):
        """Batched action -> ctrl map (vmapped act2joint / PD torque)."""
        if self.config.leg_control == "position":
            return jax.vmap(self.act2joint)(action)
        nu = self.model.nu
        return jax.vmap(
            lambda a, q, qd: self._act2tau_qv(a, q[7 : 7 + nu], qd[6 : 6 + nu])
        )(action, qpos, qvel)

    # ------------------------------------------------------------------
    def step(self, state: EnvState, action: jnp.ndarray) -> EnvState:
        """unitree-go2-env.h:418-600."""
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

    # ------------------------------------------------------------------
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
        """Command schedule + rewards + termination + info update
        (unitree-go2-env.h:439-600) on named post-step quantities — shared by
        `step` (from PipelineState fields) and the fused batched rollouts."""
        cfg = self.config
        dtype = self._dtype
        rng, cmd_rng = jax.random.split(info.rng)

        # command schedule (unitree-go2-env.h:439-457)
        if cfg.randomize_tasks:
            do_rand = (info.step % 500) == 0
            new_vel, new_ang = self.sample_command(cmd_rng)
            vel_tar = jnp.where(do_rand, new_vel, info.vel_tar)
            ang_vel_tar = jnp.where(do_rand, new_ang, info.ang_vel_tar)
        else:
            # exact reference ramp: min(v·t/T, v) — note this "ramp" snaps
            # immediately for negative commands, replicated as-is
            # (unitree-go2-env.h:448-456)
            t = info.step.astype(dtype) * self.dt
            frac = t / cfg.ramp_up_time
            vel_tar = info.vel_tar.at[0].set(
                jnp.minimum(cfg.default_vx * frac, cfg.default_vx)
            )
            vel_tar = vel_tar.at[1].set(
                jnp.minimum(cfg.default_vy * frac, cfg.default_vy)
            )
            if cfg.turn_period:
                # square-wave yaw-rate command (see turn_period docstring)
                sign = (
                    1.0 - 2.0 * ((info.step // cfg.turn_period) % 2)
                ).astype(dtype)
                mag = jnp.minimum(
                    abs(cfg.default_vyaw) * frac, abs(cfg.default_vyaw)
                )
                ang_vel_tar = info.ang_vel_tar.at[2].set(mag * sign)
            else:
                ang_vel_tar = info.ang_vel_tar.at[2].set(
                    jnp.minimum(cfg.default_vyaw * frac, cfg.default_vyaw)
                )

        # goal gating: shut the forward command off once the torso passes
        # goal_x (see goal_x docstring) — applies in rollouts too, so the
        # sampler plans the stop rather than discovering it post hoc
        if cfg.goal_x > 0.0:
            before_goal = (torso_xpos[0] < cfg.goal_x).astype(dtype)
            vel_tar = vel_tar.at[0].multiply(before_goal)

        # ---- rewards (unitree-go2-env.h:459-558) ----
        z_feet = site_xpos[self._feet_site_id, 2]
        z_feet_tar = self._foot_step_target(info.step)
        if self._crate is not None:
            # terrain-aware foot targets: the target is the MAX of the
            # ground-referenced swing profile and the support under the
            # foot.  max (not sum): summing demanded apex+lip (~0.6 m)
            # mid-swing over the box and punished exactly the crossing the
            # task needs; with max, a swing that clears the lip matches the
            # target over the box (profile amplitude > lip height) and
            # stance on the box is exact (profile 0 -> target = support).
            z_feet_tar = jnp.maximum(
                z_feet_tar,
                self._support_z(
                    site_xpos[self._feet_site_id, 0],
                    site_xpos[self._feet_site_id, 1],
                ),
            )
        reward_gaits = -jnp.sum(((z_feet_tar - z_feet) / 0.05) ** 2)

        up_global = jnp.array([0.0, 0.0, 1.0], dtype)
        up_body = rot.rotate(up_global, torso_xquat)
        reward_upright = -jnp.sum((up_body - up_global) ** 2)

        if cfg.turn_period:
            # integrate the (sign-flipping) commanded rate; carried in info
            yaw_tar = info.yaw_tar + ang_vel_tar[2] * self.dt
        else:
            # C++ closed form for a constant command (unitree-go2-env.h:489-494)
            yaw_tar = info.yaw_tar + ang_vel_tar[2] * self.dt * info.step.astype(
                dtype
            )
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
        z_tar = info.pos_tar[2]
        if self._crate is not None:
            # torso target ramps onto the crate beginning 5 cm BEFORE the
            # front edge and completing crate_ramp later (torso half a body
            # past the edge, rear feet at the lip).  Measured failure mode
            # of a ramp centered ON the edge: the target started rising
            # 0.25 m before the robot could physically place a foot on the
            # box, and the planner stalled at the ramp start (x 0.65 of a
            # 0.99 m approach) where height error was still zero.
            cx, _, hx, _, top = self._crate
            frac = jnp.clip(
                (torso_xpos[0] - (cx - hx - 0.15)) / cfg.crate_ramp, 0.0, 1.0
            )
            z_tar = z_tar + top * frac
        reward_height = -((z_torso - z_tar) ** 2)

        # energy term from the dead-code env (UnitreeGo2Env.h:699-713)
        reward_energy = jnp.asarray(0.0, dtype)
        if cfg.energy_weight != 0.0:
            tau = qfrc_actuator[6:]
            qd = qvel[6:]
            reward_energy = -jnp.sum(
                jnp.maximum(tau * qd / 160.0, 0.0) ** 2
            )

        reward = (
            0.1 * reward_gaits
            + 0.5 * reward_upright
            + 0.3 * reward_yaw
            + cfg.vel_weight * reward_vel
            + 1.0 * reward_ang_vel
            + 1.0 * reward_height
            + cfg.energy_weight * reward_energy
        )
        if cfg.y_anchor_weight != 0.0:
            reward = reward - cfg.y_anchor_weight * (
                (torso_xpos[1] - info.pos_tar[1]) ** 2
            )

        # ---- termination (unitree-go2-env.h:561-589) ----
        jr = jnp.asarray(
            self.joint_range
            if self.termination_joint_range is None
            else self.termination_joint_range,
            dtype,
        )
        joint_angles = qpos[7 : 7 + self.model.nu]
        out_of_range = jnp.any(
            (joint_angles < jr[:, 0]) | (joint_angles > jr[:, 1])
        )
        done = (
            (jnp.dot(up_body, up_global) < 0.0)
            | out_of_range
            | (z_torso < 0.18)
        )
        if cfg.done_penalty != 0.0:
            # termination-as-constraint (see config docstring)
            reward = reward - cfg.done_penalty * done.astype(dtype)

        # contact / air-time tracking (dead-code env UnitreeGo2Env.h:415-439)
        contact = (z_feet - self._foot_radius) < 1e-3
        contact_filt = contact | info.last_contact
        first_contact = (info.feet_air_time > 0.0) & contact_filt
        feet_air_time = jnp.where(
            contact_filt, 0.0, info.feet_air_time + self.dt
        )
        del first_contact  # available for future reward terms

        new_info = StateInfo(
            rng=rng,
            pos_tar=info.pos_tar,
            vel_tar=vel_tar,
            ang_vel_tar=ang_vel_tar,
            yaw_tar=yaw_tar if cfg.turn_period else info.yaw_tar,
            step=info.step + 1,
            z_feet=z_feet,
            z_feet_tar=z_feet_tar,
            last_contact=contact,
            feet_air_time=feet_air_time,
        )
        return reward, done, new_info

    # ------------------------------------------------------------------
    def _body_velocities(self, torso_xpos, torso_xquat, torso_cvel, root_com):
        """Torso body-frame linear/angular velocity (unitree-go2-env.h:527-552)."""
        offset = torso_xpos - root_com
        cvel_ang = torso_cvel[:3]
        cvel_lin = torso_cvel[3:]
        vel_lin = cvel_lin - jnp.cross(offset, cvel_ang)
        vb = rot.global_to_body_velocity(vel_lin, torso_xquat)
        ab = rot.global_to_body_velocity(cvel_ang, torso_xquat)
        return vb, ab

    def _get_obs(self, ps, info, ctrl):
        """55-dim observation (dead-code env UnitreeGo2Env.h:576-639, fixed)."""
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
