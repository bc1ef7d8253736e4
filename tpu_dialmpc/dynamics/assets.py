"""MJCF asset loading.

The upstream model snapshot is missing `unitree_go2/assets/base_4.obj`
(recorded in its `.MISSING_LARGE_BLOBS`), while `mjx_go2_force.xml` still
references it.  The mesh is visual-only (class "visual": contype=0
conaffinity=0), so we substitute a degenerate tetrahedron at load time —
physics is unaffected.

Scene paths resolve against `TPU_DIALMPC_ASSETS` (else the conventional
`/root/reference/models` checkout).  `compile_model` output can be cached to
.npz so the runtime never needs the MJCF tree at all.

Coverage: every `mjx_scene_*` file — the ones the reference executables
hard-code (dial-core-test.cpp:34) and the upstream task suite consumes — is
registered below and compiles.  The non-MJX display scenes (`scene.xml`,
`scene_real_feet.xml`, ...) carry cylinder collision geoms our narrowphase
does not implement; `compile_model` rejects them with an explicit
NotImplementedError rather than silently dropping contacts.
"""

from __future__ import annotations

import os
from pathlib import Path

# headless GL backend — must precede the first mujoco import (also set in
# tpu_dialmpc/__init__, kept here for direct-module imports)
os.environ.setdefault("MUJOCO_GL", "egl")

import mujoco

_DUMMY_OBJ = (
    b"v 0 0 0\nv 0.001 0 0\nv 0 0.001 0\nv 0 0 0.001\n"
    b"f 1 2 3\nf 1 2 4\nf 1 3 4\nf 2 3 4\n"
)

# Visual meshes known to be absent from the asset snapshot.
_MISSING_ASSETS = {"base_4.obj": _DUMMY_OBJ}

SCENES = {
    "go2_force": "unitree_go2/mjx_scene_force.xml",
    "go2_force_crate": "unitree_go2/mjx_scene_force_crate.xml",
    "go2_position": "unitree_go2/mjx_scene_position.xml",
    "go2_position_collision": "unitree_go2/mjx_scene_position_collision.xml",
    "h1_walk": "unitree_h1/mjx_scene_h1_walk.xml",
    "h1_loco": "unitree_h1/mjx_scene_h1_loco.xml",
    "h1_push_crate": "unitree_h1/mjx_scene_h1_push_crate.xml",
}


def models_root() -> Path:
    return Path(os.environ.get("TPU_DIALMPC_ASSETS", "/root/reference/models"))


def scene_path(name: str) -> Path:
    if name in SCENES:
        return models_root() / SCENES[name]
    return Path(name)


def load_mj_model(name_or_path: str) -> mujoco.MjModel:
    """Load an MJCF scene by registry name or path, patching missing assets."""
    path = scene_path(name_or_path)
    if not path.exists():
        raise FileNotFoundError(
            f"scene {name_or_path!r} not found at {path}; set TPU_DIALMPC_ASSETS"
        )
    return mujoco.MjModel.from_xml_path(str(path), dict(_MISSING_ASSETS))
