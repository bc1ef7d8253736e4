"""Named task registry: scene + env config + planner defaults per task.

Replaces the reference's hard-coded in-main config blocks
(dial_mpc_eigen/src/dial-core-test.cpp:8-34, dial-core-simulate.cpp:38-62)
with a declarative registry covering the full models/ scene inventory
(SURVEY §2.4): go2 stand/trot/crate, h1 walk/loco/push-crate.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict

_REGISTRY: Dict[str, Callable[[], object]] = {}
_DIAL_DEFAULTS: Dict[str, dict] = {}


def register_env(name: str, dial: dict | None = None):
    """Register a task factory, optionally with its planner defaults.

    `dial` is a DialConfig kwargs dict (see `dial_defaults`); tasks
    registered without one fall back to the conservative quadruped defaults
    with a warning, since a wrong lookahead can silently make a task fail
    (a biped needs ~0.64 s; the quadruped default is 0.4 s).
    """

    def deco(factory):
        _REGISTRY[name] = factory
        if dial is not None:
            _DIAL_DEFAULTS[name] = dict(dial)
        return factory

    return deco


def get_env(name: str, **overrides):
    """Instantiate a registered task env, with config-field overrides."""
    if name not in _REGISTRY:
        raise KeyError(f"unknown task {name!r}; known: {sorted(_REGISTRY)}")
    return _REGISTRY[name](**overrides)


def list_envs():
    return sorted(_REGISTRY)


# Per-task planner defaults (DialConfig kwargs), the counterpart of the
# reference's in-main config blocks (dial-core-test.cpp:8-32).  The CLI
# starts from these so `run --task X` executes the task's validated workload
# (the envelopes test_quality_tpu.py pins) rather than toy DialConfig
# defaults; YAML `dial:` sections and flags override field-by-field.
_DIAL_COMMON = dict(
    Nsample=2048,
    Ndiffuse=2,
    Ndiffuse_init=10,
    temp_sample=0.05,
    horizon_diffuse_factor=0.9,
    traj_diffuse_factor=0.5,
    ctrl_dt=0.02,
    n_steps=400,
)
# quadruped: 0.4 s lookahead; biped: the passively-unstable pelvis needs
# ~0.64 s (Hsample=32/Hnode=8) — see configs/h1_walk.yaml
_GO2_DIAL = dict(_DIAL_COMMON, Hsample=20, Hnode=5)
_H1_DIAL = dict(_DIAL_COMMON, Hsample=32, Hnode=8)


def dial_defaults(name: str) -> dict:
    """Planner (DialConfig) defaults for a registered task.

    Stored per entry at registration (not inferred from the name) so
    externally registered tasks can't silently inherit the wrong planner
    family; entries registered without dial defaults get the quadruped
    baseline with a warning.
    """
    if name not in _REGISTRY:
        raise KeyError(f"unknown task {name!r}; known: {sorted(_REGISTRY)}")
    if name not in _DIAL_DEFAULTS:
        import warnings

        warnings.warn(
            f"task {name!r} registered without planner defaults; using the "
            "quadruped baseline (Hsample=20/Hnode=5) — pass dial= to "
            "register_env if the task needs a different lookahead"
        )
        return dict(_GO2_DIAL)
    return dict(_DIAL_DEFAULTS[name])


def _go2(defaults):
    from tpu_dialmpc.envs.go2 import UnitreeGo2Env, UnitreeGo2EnvConfig

    # registered tasks default to true substepping (ctrl_dt/timestep = 8);
    # the reference's one-mj_step-per-control quirk Q2 stays reachable via
    # get_env(name, n_substeps=1)
    defaults.setdefault("n_substeps", 8)

    def factory(**overrides):
        cfg = dataclasses.replace(
            UnitreeGo2EnvConfig(**defaults), **overrides
        )
        return UnitreeGo2Env(cfg)

    return factory


def _h1(defaults):
    from tpu_dialmpc.envs.h1 import UnitreeH1Env, UnitreeH1EnvConfig

    defaults.setdefault("n_substeps", 8)  # see _go2

    def factory(**overrides):
        cfg = dataclasses.replace(UnitreeH1EnvConfig(**defaults), **overrides)
        return UnitreeH1Env(cfg)

    return factory


def _register(name: str, factory, dial: dict):
    """One registration = env factory + planner family, atomically.

    Keeping both bindings in a single call (instead of a separate
    name→defaults list) means a new task cannot get an env entry while
    silently inheriting the wrong planner lookahead."""
    _REGISTRY[name] = factory
    _DIAL_DEFAULTS[name] = dict(dial)


# Go2 tasks.  "go2_stand" mirrors the reference benchmark config
# (dial-core-test.cpp:8-32: gait=stand, vx=0.8, kp=30, kd=0.65, torque mode).
_register("go2_stand", _go2(
    dict(gait="stand", default_vx=0.8, kp=30.0, kd=0.65, leg_control="torque")
), _GO2_DIAL)
_register("go2_trot", _go2(
    dict(gait="trot", default_vx=0.8, kp=30.0, kd=0.65, leg_control="torque")
), _GO2_DIAL)
_register("go2_walk", _go2(
    dict(gait="walk", default_vx=0.5, kp=30.0, kd=0.65, leg_control="torque")
), _GO2_DIAL)
# The fast gaits carry done_penalty=2.0 (envs/go2.py: termination-as-
# constraint).  Without it the planner sustains front-thigh angles outside
# the narrow upstream action table ~26% of steps (QUALITY_r03); with it,
# measured dones drop to 0.0% while distance is preserved (canter 5.1 m,
# gallop 6.3 m over 400 steps) and minimum torso height improves.
_register("go2_canter", _go2(
    dict(gait="canter", default_vx=1.0, kp=30.0, kd=0.65,
         leg_control="torque", done_penalty=2.0)
), _GO2_DIAL)
_register("go2_gallop", _go2(
    dict(gait="gallop", default_vx=1.2, kp=30.0, kd=0.65,
         leg_control="torque", done_penalty=2.0)
), _GO2_DIAL)
# Position leg-control over the <position kp=30 kv=0.65> actuator model
# (models/unitree_go2/mjx_go2_position.xml:16-34): the env writes joint
# targets into ctrl and the model's servo closes the loop.
_register("go2_trot_position", _go2(
    dict(gait="trot", default_vx=0.8, leg_control="position", scene="go2_position")
), _GO2_DIAL)
# BASELINE configs[3] "fast turn" agility maneuver: trot with the yaw-rate
# command flipping sign every 1.5 s (75 steps) at ±1.5 rad/s; the yaw target
# integrates the commanded rate (envs/go2.py turn_period).  Gated on TPU by
# the go2_turn quality gate (heading tracks the reversing command).
_register("go2_turn", _go2(
    dict(
        gait="trot",
        default_vx=0.3,
        default_vyaw=1.5,
        turn_period=75,
        kp=30.0,
        kd=0.65,
        leg_control="torque",
        # the round-5 multi-seed audit flagged this gate's done rate as
        # seed-sensitive (0.08 at seed 7 vs 0.0 at seed 13; joint-range
        # grazes under an unlucky noise draw) — price the termination
        # predicate like every other fast gait
        done_penalty=2.0,
    )
), _GO2_DIAL)
_register("go2_crate", _go2(
    dict(
        gait="trot",
        default_vx=0.5,
        kp=30.0,
        kd=0.65,
        leg_control="torque",
        scene="go2_force_crate",
        done_penalty=2.0,  # 18.5% -> 0.0% dones pressing the wall
    )
), _GO2_DIAL)
# Crate CLIMB (vs go2_crate's press-the-wall): the reference's own obstacle
# scene with the mocap crate repositioned so its top face is at 0.30 m
# (mjx_scene_force_crate.xml:24-28 — the XML pose parks it at 0.6 m, which
# a 0.27 m-tall robot cannot mount; the mocap body is runtime-positioned by
# design).  Terrain-aware rewards (envs/go2.py crate_top_z) steer footholds
# onto the box; goal_x stops the forward command at the crate center so the
# task ends standing ON the crate, torso ~0.57 m.  Gated by the
# go2_crate_climb quality gate (torso sustained above 0.50 m with all four
# feet on the crate top).
_register("go2_crate_climb", _go2(
    dict(
        gait="climb",
        default_vx=0.5,
        kp=30.0,
        kd=0.65,
        leg_control="torque",
        scene="go2_force_crate",
        crate_top_z=0.30,
        goal_x=1.35,
        # terminate (and price, via done_penalty) the PHYSICAL hinge box,
        # not the locomotion action table: the measured mounting
        # trajectory spends ~48% of steps outside the narrow table
        # (inverted/height clean) — pricing the table blocks the climb
        # (probe: x stalls at 0.94 half-mounted), pricing physical
        # violations only lets it mount (x 1.36 = goal, feet on top)
        termination_range_source="physical",
        done_penalty=2.0,
        # keep the approach centered: lateral drift is otherwise free and
        # the planner straddles the box's side edge (probe: y -0.43)
        y_anchor_weight=1.0,
        # break the approach-vs-height-target trade toward progress: at
        # 1.5 the planner half-mounts (fronts up) and parks; at 2.5 the
        # rear-kick mount becomes profitable and the probe mounts cleanly
        # (x 1.36 = goal, torso settles 0.50 on the crate top, feet on
        # top, zero terminations of any cause)
        vel_weight=2.5,
    )
), dict(_GO2_DIAL, Hsample=25, n_steps=600))
# BASELINE configs[3] "fast jump" agility maneuver: pronking — the all-feet-
# in-phase gait commands simultaneous lift-off, so tracking it requires
# ballistic flight phases.  Runs on the collision-geom scene
# (mjx_go2_force_collision.xml:96-129 torso/calf collision geoms via the
# crate scene) so crash landings resolve real contacts; starts at x=0, 1.3 m
# from the crate.  done_penalty prices the termination predicate in the
# rollouts (landing joint excursions otherwise graze the narrow upstream
# thigh range, envs/go2.py done_penalty docstring).
_register("go2_jump", _go2(
    dict(
        gait="pronk",
        # round-4 audit: at vx=0.3 the pronk barely traveled (+0.63 m / 8 s
        # — "the easy half" of the agility claim).  vx=0.5 with the box
        # parked down-range (crate_x — the XML's 0.6 m wall sits at x~1,
        # inside the travel path) makes forward progress part of the gate.
        default_vx=0.5,
        kp=30.0,
        kd=0.65,
        leg_control="torque",
        scene="go2_force_crate",
        crate_x=30.0,
        done_penalty=2.0,
    )
), _GO2_DIAL)

# H1 tasks (scene inventory only in the reference; SURVEY §2.4).
_register("h1_walk", _h1(
    dict(gait="walk", default_vx=0.5, scene="h1_walk")
), _H1_DIAL)
_register("h1_loco", _h1(
    dict(gait="walk", default_vx=0.5, scene="h1_loco")
), _H1_DIAL)
_register("h1_push_crate", _h1(
    # the 30 kg crate caps push speed below default_vx; the anchor leash
    # (envs/h1.py pos_anchor_leash) keeps the blocked-progress penalty
    # bounded so the planner doesn't trade balance for lunging, and the
    # capped crate-velocity reward (crate_vel_weight) makes steady pushing
    # beat both sidestepping the crate and dive-shoving it
    dict(
        gait="walk",
        default_vx=0.3,
        scene="h1_push_crate",
        pos_anchor_leash=0.4,
        # measured over 500 steps (Hsample=32/Hnode=8/Nsample=2048): weight 3
        # → crate +0.25 m, pelvis min 0.77; weight 6 → crate +0.45 m, pelvis
        # min 0.86 — stronger crate reward also stabilizes (pushing posture
        # beats lunging)
        crate_vel_weight=6.0,
        # after the capsule-box contact-dedup fix (exact MuJoCo crate
        # forces) the planner rediscovered dive-shoving: crate +1.87 m with
        # the pelvis down at 0.17 m (QUALITY_r04 first run).  Price the
        # termination predicate in the sampler, as for the Go2 fast gaits.
        done_penalty=2.0,
    )
), _H1_DIAL)
