"""CLI: run / bench / replay DIAL-MPC tasks from YAML or flags.

Replaces the reference's hard-coded in-main configs and absolute model paths
(dial-core-test.cpp:8-34) with a task registry + config file system (the
upstream Python dial-mpc used YAML; the C++ fork dropped it — SURVEY §5).

Usage:
  python -m tpu_dialmpc.cli.main run --task go2_stand --n-steps 100
  python -m tpu_dialmpc.cli.main run --config cfg.yaml
  python -m tpu_dialmpc.cli.main bench --task go2_stand --nsample 2048
  python -m tpu_dialmpc.cli.main replay --trajectory out.npz
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time

import numpy as np


def _load_yaml(path):
    import yaml

    with open(path) as f:
        return yaml.safe_load(f)


def _build(args):
    from tpu_dialmpc.envs import get_env
    from tpu_dialmpc.planner.dial import DialConfig

    from tpu_dialmpc.envs.registry import dial_defaults

    env_overrides = {}
    if args.config:
        cfg = _load_yaml(args.config)
        task = cfg.get("task", args.task)
        # registry task defaults < yaml dial section < explicit flags
        dial_kwargs = dial_defaults(task)
        env_overrides.update(cfg.get("env", {}))
        dial_kwargs.update(cfg.get("dial", {}))
    else:
        task = args.task
        dial_kwargs = dial_defaults(task)
    if args.nsample:
        dial_kwargs["Nsample"] = args.nsample
    if args.hsample:
        dial_kwargs["Hsample"] = args.hsample
    if args.n_steps:
        dial_kwargs["n_steps"] = args.n_steps
    if args.substeps:
        env_overrides["n_substeps"] = args.substeps
    env = get_env(task, **env_overrides)
    return env, DialConfig(**dial_kwargs), task


def cmd_run(args):
    from tpu_dialmpc.planner import runner
    from tpu_dialmpc.telemetry import TelemetryStream

    env, dial_cfg, task = _build(args)
    stream = TelemetryStream(args.telemetry) if args.telemetry else None
    resume = None
    if args.resume:
        from tpu_dialmpc import checkpoint

        state, Y0, key, ckpt_cfg, step = checkpoint.load(args.resume, env)
        resume = (state, Y0, key, step)
        # the checkpoint's planner config is authoritative (the restored Y0
        # has its Hnode+1 shape); --n-steps only extends the run
        dial_cfg = ckpt_cfg
        if args.n_steps:
            dial_cfg = dataclasses.replace(dial_cfg, n_steps=args.n_steps)
        print(f"resumed from {args.resume} at step {step}")
    t0 = time.time()
    if args.scan:
        # fully on-device driver: one lax.scan over control steps (no host
        # syncs; telemetry/checkpointing need the host loop)
        if args.resume or args.checkpoint or args.telemetry:
            raise SystemExit(
                "--scan is incompatible with --resume/--checkpoint/--telemetry "
                "(those need the host-loop driver)"
            )
        res = runner.run_scan(env, dial_cfg)
    else:
        res = runner.run(
            env,
            dial_cfg,
            telemetry=stream,
            resume=resume,
            checkpoint_path=args.checkpoint,
        )
    wall = time.time() - t0
    if stream:
        stream.close()
    rewards = np.asarray(res.rewards)
    print(f"task={task} steps={rewards.shape[0]} wall={wall:.2f}s")
    print(f"average reward: {rewards.mean():.6f}")  # dial-core-test.cpp:101-106
    if args.out:
        np.savez(
            args.out,
            rewards=rewards,
            qpos=np.asarray(res.qpos),
            qvel=np.asarray(res.qvel),
            us=np.asarray(res.us),
            dones=np.asarray(res.dones),
            # predecessor of the first recorded step (reset state, or the
            # resume checkpoint's) — us[0] was executed from here.  The
            # warmstart matters for exact replay: the truncated Newton
            # solver's starting point is observable, and a checkpoint's is
            # nonzero.  dt is the control period the run actually used —
            # `cli render` must not re-derive it from flags.
            qpos0=np.asarray(res.qpos0),
            qvel0=np.asarray(res.qvel0),
            warmstart0=np.asarray(res.warmstart0),
            dt=float(env.dt),
        )
        print(f"trajectory saved to {args.out}")
    return 0


def cmd_plot(args):
    """Render the reference plotting fork's 6 state charts from a trajectory.

    Matplotlib counterpart of the gnuplot telemetry in
    dial_mpc_eigen_plotting/src/dial-core-simulate.cpp:219-329: base position,
    base orientation (quat), joint positions, base velocity, base angular
    velocity, joint velocities — plus the per-step reward the reference
    printed to stdout.
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    data = np.load(args.trajectory)
    qpos, qvel = data["qpos"], data["qvel"]
    fig, axes = plt.subplots(2, 4, figsize=(22, 9))
    panels = [
        ("Graph 1: Base Position (x,y,z)", qpos[:, 0:3], ("x", "y", "z")),
        ("Graph 5: Base Orientation", qpos[:, 3:7], ("qw", "qx", "qy", "qz")),
        ("Graph 2: Joints Position", qpos[:, 7:], None),
        ("Graph 3: Base Velocity", qvel[:, 0:3], ("vx", "vy", "vz")),
        ("Graph 6: Base Angular Velocity", qvel[:, 3:6], ("wx", "wy", "wz")),
        ("Graph 4: Joints Velocity", qvel[:, 6:], None),
        ("Reward", data["rewards"][:, None], ("reward",)),
        ("Executed controls", data["us"], None),
    ]
    for ax, (title, series, labels) in zip(axes.ravel(), panels):
        for i in range(series.shape[1]):
            lbl = labels[i] if labels else f"{i}"
            ax.plot(series[:, i], label=lbl, linewidth=0.9)
        ax.set_title(title)
        ax.set_xlabel("control step")
        if series.shape[1] <= 4:
            ax.legend(fontsize=7)
    fig.tight_layout()
    out = args.out or "trajectory_plots.png"
    fig.savefig(out, dpi=120)
    print(f"plots saved to {out}")
    return 0


def _executed_torques(env, data):
    """Per-step executed joint torques (T, nu) from a saved trajectory.

    `us[t]` was applied to the state BEFORE step t (runner.run appends the
    post-step qpos with the pre-step action), so each action pairs with
    (qpos[t-1], qvel[t-1]); the t=0 predecessor is the saved qpos0/qvel0
    (reset state, or the resume checkpoint's — present in npz files written
    by `cli run --out`), falling back to the keyframe-deterministic reset
    state for older files.  The action maps to ctrl via the env's own
    mapping (PD torque or position target), and the actuator force is the
    engine's mj_fwdActuation (smooth.actuator_force: gain·ctrl + affine
    bias, force/ctrl ranges, gear).  Torque mode is exact (ctrl IS the
    applied force, constant over the control step); position mode is the
    start-of-step servo force kp·(ctrl−q)−kv·qd — with substepping the
    servo force then drifts as q evolves within the step, so arrows show
    the instantaneous torque at step entry, not the substep mean.
    """
    import jax
    import jax.numpy as jnp

    from tpu_dialmpc.dynamics import smooth

    if "qpos0" in data:
        q0, v0 = data["qpos0"], data["qvel0"]
    else:
        ps0 = env.reset(jax.random.PRNGKey(0)).pipeline
        q0, v0 = np.asarray(ps0.qpos), np.asarray(ps0.qvel)
    qpos_prev = np.concatenate([q0[None], np.asarray(data["qpos"])[:-1]])
    qvel_prev = np.concatenate([v0[None], np.asarray(data["qvel"])[:-1]])
    model = env.model
    dofadr = np.asarray(model.actuator_dofadr)

    @jax.jit
    def all_tau(us, qpos, qvel):
        ctrl = env._ctrl_batch(us, qpos, qvel)
        qfrc = jax.vmap(
            lambda c, q, qd: smooth.actuator_force(model, c, q, qd)
        )(ctrl, qpos, qvel)
        return qfrc[:, dofadr]

    return np.asarray(
        all_tau(
            jnp.asarray(data["us"], jnp.float32),
            jnp.asarray(qpos_prev, jnp.float32),
            jnp.asarray(qvel_prev, jnp.float32),
        )
    )


def cmd_render(args):
    """Offscreen-render a saved trajectory to MP4/GIF (tools/render.py).

    Headless counterpart of the reference's interactive replay viewer
    (mujoco-sim.h:154-174): `cli run --out traj.npz` then
    `cli render --trajectory traj.npz --out traj.mp4`."""
    from tpu_dialmpc.tools.render import render_trajectory, view_trajectory

    if not args.trajectory:
        raise SystemExit("render needs --trajectory <traj.npz>")
    data = np.load(args.trajectory)
    env, dial_cfg, _ = _build(args)
    if args.interactive:
        # live-window replay (C14 equivalent) for workstation users
        try:
            view_trajectory(
                env.config.scene,
                data["qpos"],
                float(data["dt"]) if "dt" in data else env.dt,
            )
        except RuntimeError as e:
            raise SystemExit(str(e))
        return 0
    out = args.out or (args.trajectory.rsplit(".", 1)[0] + ".mp4")
    # prefer the recording's own control period (saved by `run --out`): the
    # rebuilt env's dt follows current flags/registry defaults, which need
    # not match how the trajectory was recorded (e.g. a --substeps 1 run
    # rendered later with defaults would play 8x off)
    dt = float(data["dt"]) if "dt" in data else env.dt
    fps = 1.0 / max(dt, 1e-9)
    tau = None
    if args.torques:
        tau = _executed_torques(env, data)
    written = render_trajectory(
        # the env's host model, so task-time scene patches (crate_top_z /
        # crate_x) are drawn where the task put them
        getattr(env, "mj_model", env.config.scene),
        data["qpos"],
        out,
        fps=fps,
        track_body=env.TORSO_BODY,
        tau=tau,
    )
    print(f"rendered {data['qpos'].shape[0]} frames to {written}")
    return 0


def cmd_bench(args):
    import bench as bench_mod  # repo-root bench harness

    kw = dict(
        task=args.task,
        nsample=args.nsample or 2048,
        hsample=args.hsample or 20,
        iters=args.iters,
    )
    if args.hnode is not None:
        kw["hnode"] = args.hnode
    if args.substeps is not None:
        kw["n_substeps"] = args.substeps
    line = bench_mod.run_bench(**kw)
    if args.full:
        # the extras bench.py itself emits: control-step latency + roofline
        extra = [bench_mod.run_control_step_bench(**kw)]
        try:
            extra.append(
                bench_mod.run_roofline(
                    task=kw["task"], nsample=kw["nsample"],
                    hsample=kw["hsample"],
                    n_substeps=kw.get("n_substeps", 8),
                )
            )
        except Exception as e:  # CPU hosts: fused kernel unavailable
            extra.append({"metric": "skipped", "error": str(e)[:200]})
        line["extra"] = extra
    print(json.dumps(line))
    return 0


def cmd_replay(args):
    """Replay a saved trajectory through the physics, print tracking stats."""
    import jax.numpy as jnp

    from tpu_dialmpc.envs import get_env

    data = np.load(args.trajectory)
    env, dial_cfg, task = _build(args)
    import jax

    state = env.reset(jax.random.PRNGKey(0))
    if "qpos0" in data:
        # us[0] was executed from the saved predecessor state (the resume
        # checkpoint's, on resumed runs) — replay from there, not the reset
        # keyframe
        from tpu_dialmpc.dynamics import pipeline as _pipeline

        dtype = state.pipeline.qpos.dtype
        ps = _pipeline.init(
            env.model,
            jnp.asarray(data["qpos0"], dtype),
            jnp.asarray(data["qvel0"], dtype),
        )
        if "warmstart0" in data:
            # pipeline.init deliberately zeroes qacc_warmstart; a resumed
            # run's predecessor carries the checkpoint's, and the truncated
            # Newton solve is sensitive to its starting point
            ps = ps._replace(
                qacc_warmstart=jnp.asarray(data["warmstart0"], dtype)
            )
        state = state._replace(pipeline=ps)
    step = jax.jit(env.step)
    drift = []
    for t in range(data["us"].shape[0]):
        state = step(state, jnp.asarray(data["us"][t]))
        drift.append(
            float(np.linalg.norm(np.asarray(state.pipeline.qpos) - data["qpos"][t]))
        )
    print(f"replayed {len(drift)} steps; final qpos drift {drift[-1]:.3e}")
    return 0


def cmd_env_test(args):
    """Env smoke test: reset + zero-action steps, print state/termination.

    Headless counterpart of the reference's go2_env_test interactive viewer
    loop (dial_mpc_eigen/src/unitree-go2-env-test.cpp:91-204)."""
    import jax
    import jax.numpy as jnp

    from tpu_dialmpc.envs import get_env

    env, _, task = _build(args)
    state = env.reset(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    zero = jnp.zeros(env.action_size)
    n = args.n_steps or 100
    for t in range(n):
        state = step(state, zero)
        if t % max(1, n // 10) == 0:
            z = float(state.pipeline.qpos[2])
            print(
                f"step {t}: z={z:.4f} reward={float(state.reward):+.4f} "
                f"done={bool(state.done)}"
            )
        if bool(state.done):
            print(f"terminated at step {t}")
            break
    print(f"final qpos[:7]: {np.asarray(state.pipeline.qpos[:7]).round(4)}")
    return 0


def cmd_ik(args):
    """IK / keyframe probe (dial_mpc/src/legged_robot_ik.cpp).

    --mode ik: Jacobian IK holding the feet while shifting the base;
    --mode settle: shift base, PD-hold home pose, step physics to settle."""
    from tpu_dialmpc.envs import get_env
    from tpu_dialmpc.tools import ik as ik_mod

    env, _, task = _build(args)
    offset = [args.dx, args.dy, args.dz]
    if args.mode == "ik":
        q, res = ik_mod.solve_feet_ik(env, offset)
        print(f"feet-position residual: {float(res):.2e} m")
    else:
        q = ik_mod.settle_probe(env, offset)
    q = np.asarray(q)
    print(f"base: {q[:3].round(4)} quat: {q[3:7].round(4)}")
    print(f"joint angles: {q[7:].round(4)}")
    return 0


def cmd_profile(args):
    """Per-phase timings + fused-kernel roofline (telemetry/profile.py)."""
    from tpu_dialmpc.telemetry import profile as prof

    print("phase timings (amortized, ms):")
    for k, v in prof.phase_timings(
        task=args.task,
        nsample=args.nsample or 2048,
        hsample=args.hsample or 20,
        n_substeps=args.substeps or 8,
    ).items():
        print(f"  {k}: {v:.3f}")
    try:
        roof = prof.fused_kernel_roofline(
            task=args.task,
            nsample=args.nsample or 2048,
            n_substeps=args.substeps or 8,
            hsample=args.hsample or 20,
        )
        print("fused kernel roofline:")
        for k, v in roof.items():
            print(f"  {k}: {v}")
    except RuntimeError as e:
        print(f"roofline skipped: {e}")
    if args.out:
        from tpu_dialmpc.telemetry.profile import capture_trace
        import jax
        import jax.numpy as jnp

        from tpu_dialmpc.planner.dial import DialConfig, MBDPI

        env, dial_cfg, _ = _build(args)
        mbdpi = MBDPI(dial_cfg, env)
        state = env.reset(jax.random.PRNGKey(0))
        Y0 = jnp.zeros((dial_cfg.Hnode + 1, env.action_size))
        scale = jnp.asarray(mbdpi.sigma_control, Y0.dtype)
        fn = jax.jit(mbdpi.reverse_once)
        fn(state, jax.random.PRNGKey(1), Y0, scale)  # compile first
        capture_trace(
            args.out, fn, state, jax.random.PRNGKey(2), Y0, scale
        )
        print(f"profiler trace written to {args.out}")
    return 0


def cmd_scaling(args):
    """Strong-scaling report over device-mesh sizes (shard/scaling.py)."""
    from tpu_dialmpc.shard.scaling import scaling_report

    rows = scaling_report(
        task=args.task,
        nsample=args.nsample or 2048,
        hsample=args.hsample or 20,
        n_substeps=args.substeps or 8,
    )
    for r in rows:
        print(json.dumps(r))
    return 0


def main(argv=None):
    p = argparse.ArgumentParser(prog="tpu_dialmpc")
    sub = p.add_subparsers(dest="cmd", required=True)
    for name, fn in [
        ("run", cmd_run),
        ("bench", cmd_bench),
        ("replay", cmd_replay),
        ("plot", cmd_plot),
        ("render", cmd_render),
        ("env-test", cmd_env_test),
        ("ik", cmd_ik),
        ("profile", cmd_profile),
        ("scaling", cmd_scaling),
    ]:
        sp = sub.add_parser(name)
        sp.add_argument("--task", default="go2_stand")
        sp.add_argument("--config", default=None)
        sp.add_argument("--nsample", type=int, default=None)
        sp.add_argument("--hsample", type=int, default=None)
        sp.add_argument("--n-steps", type=int, default=None)
        sp.add_argument("--substeps", type=int, default=None)
        sp.add_argument("--telemetry", default=None, help="JSONL output path")
        sp.add_argument("--out", default=None, help="trajectory .npz output")
        sp.add_argument("--iters", type=int, default=20)
        sp.add_argument("--hnode", type=int, default=None)
        sp.add_argument(
            "--full", action="store_true",
            help="bench: also emit control-step + roofline extras",
        )
        sp.add_argument(
            "--interactive", action="store_true",
            help="render: live-window replay (needs a display)",
        )
        sp.add_argument("--trajectory", default=None)
        sp.add_argument("--scan", action="store_true", help="on-device scan driver")
        sp.add_argument(
            "--torques",
            action="store_true",
            help="render per-joint torque arrows (RViz marker equivalent)",
        )
        sp.add_argument("--checkpoint", default=None, help="checkpoint .npz path")
        sp.add_argument("--resume", default=None, help="resume from checkpoint")
        sp.add_argument("--mode", default="ik", choices=("ik", "settle"))
        sp.add_argument("--dx", type=float, default=0.0)
        sp.add_argument("--dy", type=float, default=0.0)
        sp.add_argument("--dz", type=float, default=0.0)
        sp.set_defaults(fn=fn)
    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
