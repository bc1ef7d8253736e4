"""Build + run harness for the compiled-reference parity oracle.

Compiles tests/native/parity_shim.cpp against the UNMODIFIED reference
headers (/root/reference/dial_mpc_eigen/include), the mujoco wheel's C
headers + libmujoco, and the Eigen tree bundled with tensorflow.  The env
header includes <GLFW/glfw3.h> but uses nothing from it (only the viewer
translation units do), so a one-line stub satisfies the include without
touching the reference.

The Go2 asset snapshot is missing `assets/base_4.obj` (recorded in the
reference's .MISSING_LARGE_BLOBS); `stage_assets` builds a symlink tree plus
a degenerate visual-only mesh so mj_loadXML succeeds — physics unaffected
(the mesh is contype=0/conaffinity=0, see dynamics/assets.py).
"""

from __future__ import annotations

import os
import subprocess
import sysconfig
from pathlib import Path

import numpy as np

REF_INCLUDE = Path("/root/reference/dial_mpc_eigen/include")
REF_MODELS = Path("/root/reference/models")
_SITE = Path(sysconfig.get_paths()["purelib"])
MJ_DIR = _SITE / "mujoco"
EIGEN_INCLUDE = _SITE / "tensorflow" / "include"
HERE = Path(__file__).parent
SRC = HERE / "native" / "parity_shim.cpp"
BUILD = HERE / "native" / "build"

_DUMMY_OBJ = (
    "v 0 0 0\nv 0.001 0 0\nv 0 0.001 0\nv 0 0 0.001\n"
    "f 1 2 3\nf 1 2 4\nf 1 3 4\nf 2 3 4\n"
)


def _mujoco_lib() -> str:
    libs = sorted(MJ_DIR.glob("libmujoco.so*"))
    if not libs:
        raise FileNotFoundError("libmujoco.so* not found in the mujoco wheel")
    return libs[-1].name


def available() -> bool:
    return REF_INCLUDE.exists() and MJ_DIR.exists() and EIGEN_INCLUDE.exists()


def stage_assets(root: Path) -> Path:
    """Symlink the reference Go2 model tree + patch the missing mesh.

    Returns the path to the loadable mjx_scene_force.xml."""
    go2 = root / "unitree_go2"
    assets = go2 / "assets"
    assets.mkdir(parents=True, exist_ok=True)
    for f in (REF_MODELS / "unitree_go2").iterdir():
        if f.is_file():
            dst = go2 / f.name
            if not dst.exists():
                dst.symlink_to(f)
    for f in (REF_MODELS / "unitree_go2" / "assets").iterdir():
        dst = assets / f.name
        if not dst.exists():
            dst.symlink_to(f)
    missing = assets / "base_4.obj"
    if not missing.exists():
        missing.write_text(_DUMMY_OBJ)
    return go2 / "mjx_scene_force.xml"


def build_shim() -> Path:
    """Compile (cached) and return the shim binary path."""
    BUILD.mkdir(parents=True, exist_ok=True)
    stub = BUILD / "glfw_stub" / "GLFW"
    stub.mkdir(parents=True, exist_ok=True)
    (stub / "glfw3.h").write_text("#pragma once\n")
    exe = BUILD / "parity_shim"
    deps = [SRC, REF_INCLUDE / "dial-core.h", REF_INCLUDE / "unitree-go2-env.h"]
    if exe.exists() and all(
        exe.stat().st_mtime > d.stat().st_mtime for d in deps
    ):
        return exe
    cmd = [
        "g++", "-O2", "-std=c++17",
        f"-I{REF_INCLUDE}",
        f"-I{MJ_DIR / 'include'}",
        f"-I{EIGEN_INCLUDE}",
        f"-I{stub.parent}",
        str(SRC),
        f"-L{MJ_DIR}", f"-l:{_mujoco_lib()}",
        f"-Wl,-rpath,{MJ_DIR}",
        "-o", str(exe),
    ]
    subprocess.run(cmd, check=True, capture_output=True, text=True)
    return exe


def run_shim(
    out_dir: Path,
    model_xml: Path,
    Hsample: int,
    Hnode: int,
    Nsample: int,
    Ndiffuse: int = 2,
    Ndiffuse_init: int = 2,
    n_steps: int = 3,
    seed: int = 0,
    warmstart: bool = False,
) -> dict:
    """Run the oracle; return dict of numpy arrays keyed by dump name."""
    exe = build_shim()
    out_dir.mkdir(parents=True, exist_ok=True)
    subprocess.run(
        [
            str(exe), str(model_xml), str(out_dir),
            str(Hsample), str(Hnode), str(Nsample), str(Ndiffuse),
            str(Ndiffuse_init), str(n_steps), str(seed),
            "1" if warmstart else "0",
        ],
        check=True, capture_output=True, text=True,
        env={**os.environ, "MUJOCO_GL": "disabled"},
    )
    meta = dict(
        line.split("=")
        for line in (out_dir / "meta.txt").read_text().splitlines()
    )
    meta = {k: int(v) for k, v in meta.items()}
    n_a, N, H1 = meta["n_anneals"], meta["Nsample"], meta["Hnode"] + 1
    nu, nq, nv, T = meta["nu"], meta["nq"], meta["nv"], meta["n_steps"]

    def load(name, shape):
        a = np.fromfile(out_dir / name, dtype=np.float64)
        return a.reshape(shape)

    return {
        "meta": meta,
        "z": load("z.bin", (n_a, N, H1, nu)),
        "phys_in": load("phys_in.bin", (n_a, nq + 2 * nv)),
        "nodes": load("nodes.bin", (n_a, H1, nu)),
        "rews": load("rews.bin", (n_a, N + 1)),
        "exec_in": load("exec_in.bin", (T, nq + 2 * nv)),
        "actions": load("actions.bin", (T, nu)),
        "reward": load("reward.bin", (T,)),
        "qpos": load("qpos.bin", (T, nq)),
    }
