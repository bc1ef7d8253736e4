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

import os as _os

# mujoco binds its GL backend from MUJOCO_GL at its FIRST import anywhere in
# the process (default on Linux is glfw, which needs a display); select the
# headless EGL backend up front so offscreen rendering (tools/render.py)
# works.  The GL library only actually loads at Renderer creation, so this is
# harmless when rendering is never used.
_os.environ.setdefault("MUJOCO_GL", "egl")

# True-f32 matmuls: XLA-TPU lowers f32 dot/einsum operands to bfloat16 by
# default, which corrupts exactly the places this workload is sensitive —
# contact-solver matvecs in the XLA physics path and the planner's
# softmax-weighted candidate average (measured: bf16 default puts the XLA
# pipeline ~0.5 qvel away from the float64 oracle on contact-rich states;
# the fused Pallas kernel, which is pure-f32 VPU math, matches it to <1e-4).
# Every matmul here is tiny, so "highest" costs nothing.
import jax as _jax_prec

_jax_prec.config.update("jax_default_matmul_precision", "highest")

# Hard platform override.  Remote-TPU shims (e.g. a sitecustomize registering
# a tunneled PJRT plugin) may set the jax_platforms CONFIG at interpreter
# start, which silently outranks a JAX_PLATFORMS env var set by the user —
# and initializing the remote backend can block indefinitely when the tunnel
# is unhealthy.  TPU_DIALMPC_PLATFORM wins over both because config.update
# here runs after any sitecustomize and before any computation.
if _os.environ.get("TPU_DIALMPC_PLATFORM"):
    _jax_prec.config.update(
        "jax_platforms", _os.environ["TPU_DIALMPC_PLATFORM"]
    )

# Persistent XLA compilation cache: the planner graphs are large (full physics
# under vmap∘scan), so first-compile is expensive — cache it across processes.
if not _os.environ.get("TPU_DIALMPC_NO_CACHE"):
    import jax as _jax

    def _host_tag() -> str:
        # CPU AOT artifacts embed the compile machine's ISA features; loading
        # them on a host without those features can SIGILL, so the default
        # cache is partitioned by a fingerprint of the host CPU flags.
        import hashlib
        import platform

        # JAX_PLATFORMS is part of the tag: under a remote-TPU tunnel (axon)
        # CPU executables are AOT-compiled on the *service* host, whose CPU
        # differs from the local one — the two must not share cache entries.
        # Partition by the EFFECTIVE platform selection: the jax_platforms
        # CONFIG value covers all three sources — the env var, a shim's
        # config.update at interpreter start, and the TPU_DIALMPC_PLATFORM
        # override above.  (A remote-TPU tunnel AOT-compiles CPU executables
        # on the service host's CPU, so tunnel and local runs must not share
        # cache entries.)
        _eff_platforms = (
            getattr(_jax_prec.config, "jax_platforms", None)
            or _os.environ.get("JAX_PLATFORMS", "")
        )
        feat = platform.machine() + str(_eff_platforms)
        try:
            with open("/proc/cpuinfo") as f:
                for line in f:
                    if line.startswith("flags"):
                        feat += line
                        break
        except OSError:
            pass
        return hashlib.sha1(feat.encode()).hexdigest()[:12]

    _cache_dir = _os.environ.get(
        "TPU_DIALMPC_CACHE_DIR",
        _os.path.join(
            _os.path.expanduser("~"), ".cache", f"tpu_dialmpc_xla_{_host_tag()}"
        ),
    )
    try:
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        # cache EVERY compile: on a degraded tunnel even a single eager
        # concatenate has been observed to take >90 s server-side, and sub-1s
        # programs that were never cached are exactly the ones that stall the
        # next run
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:  # older jax without these flags
        pass
