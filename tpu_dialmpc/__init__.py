"""tpu_dialmpc — a TPU-native DIAL-MPC engine.

A from-scratch reimplementation of the capabilities of the reference
`laasyak02/dial-mpc` (C++/Eigen/MuJoCo sampling-based MPC for Unitree Go2/H1),
re-designed for TPU hardware:

- `core/`      pure math: linear-map cubic splines, quaternion ops, PRNG plumbing
- `dynamics/`  batched JAX rigid-body physics (MuJoCo semantics: Newton solver,
               pyramidal friction cones, semi-implicit Euler) compiled from MJCF
- `envs/`      pure-functional environments over a State pytree (Go2, H1)
- `planner/`   the DIAL-MPC / MBDPI annealed sampling planner
- `shard/`     device-mesh sharding of the sample axis + collective softmax update
- `telemetry/` async host-side telemetry stream
- `cli/`       config system, task registry, run/bench/replay entry points

The reference implementation is cited throughout as `dial_mpc_eigen/...:<line>`
(paths relative to the upstream repo root).
"""

__version__ = "0.1.0"
