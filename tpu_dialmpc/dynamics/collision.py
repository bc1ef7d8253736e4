"""Static-shape narrowphase collision (plane/sphere/capsule/box primitives).

The candidate pair list is fixed at model-compile time (model.py), so the
contact set has a static shape: every pair contributes a fixed number of slots
with an `active = dist < includemargin` mask.  No broadphase, no dynamic
counts — ideal for vmap/jit on TPU.

Conventions match MuJoCo: contact normal points from geom1 into geom2,
`pos` is midway between the surfaces, `frame` rows are [normal, tangent1,
tangent2] built like mju_makeFrame — except plane-capsule, where MuJoCo
aligns tangent1 with the capsule axis projected onto the plane (see
`_plane_capsule`), which orients the friction pyramid.

Approximations (documented divergences from MuJoCo's narrowphase, used only by
the crate tasks): capsule-box emits two sphere-box style contacts (deepest
segment point + deeper endpoint) instead of the full edge-clipping manifold;
box-box emits corner-in-box contacts only (no edge-edge manifold).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from tpu_dialmpc.dynamics.kinematics import Kinematics
from tpu_dialmpc.dynamics.model import (
    GEOM_BOX,
    GEOM_CAPSULE,
    GEOM_PLANE,
    GEOM_SPHERE,
    PhysicsModel,
)


class Contacts(NamedTuple):
    """Dynamic contact data, fixed leading dim ncon_max (model.ncon_max)."""

    dist: jnp.ndarray  # (ncon,)
    pos: jnp.ndarray  # (ncon, 3)
    frame: jnp.ndarray  # (ncon, 3, 3) rows: normal, t1, t2


class ContactParams(NamedTuple):
    """Static per-slot parameters aligned with Contacts rows (numpy)."""

    body1: np.ndarray
    body2: np.ndarray
    geom1: np.ndarray
    geom2: np.ndarray
    condim: np.ndarray
    friction: np.ndarray  # (ncon, 5)
    solref: np.ndarray  # (ncon, 2)
    solimp: np.ndarray  # (ncon, 5)
    includemargin: np.ndarray  # (ncon,)
    invweight: np.ndarray  # (ncon,)


def contact_params(model: PhysicsModel) -> ContactParams:
    """Expand the per-pair static tables to per-contact-slot arrays."""
    rows = {k: [] for k in ContactParams._fields}
    for kind in sorted(model.pairs):
        p = model.pairs[kind]
        npair = p.geom1.shape[0]
        for i in range(npair):
            for _ in range(p.ncon):
                rows["body1"].append(model.geom_bodyid[p.geom1[i]])
                rows["body2"].append(model.geom_bodyid[p.geom2[i]])
                rows["geom1"].append(p.geom1[i])
                rows["geom2"].append(p.geom2[i])
                rows["condim"].append(p.condim[i])
                rows["friction"].append(p.friction[i])
                rows["solref"].append(p.solref[i])
                rows["solimp"].append(p.solimp[i])
                rows["includemargin"].append(p.margin[i] - p.gap[i])
                rows["invweight"].append(p.invweight[i])
    return ContactParams(
        body1=np.array(rows["body1"], dtype=np.int32),
        body2=np.array(rows["body2"], dtype=np.int32),
        geom1=np.array(rows["geom1"], dtype=np.int32),
        geom2=np.array(rows["geom2"], dtype=np.int32),
        condim=np.array(rows["condim"], dtype=np.int32),
        friction=np.stack(rows["friction"]) if rows["friction"] else np.zeros((0, 5)),
        solref=np.stack(rows["solref"]) if rows["solref"] else np.zeros((0, 2)),
        solimp=np.stack(rows["solimp"]) if rows["solimp"] else np.zeros((0, 5)),
        includemargin=np.array(rows["includemargin"]),
        invweight=np.array(rows["invweight"]),
    )


def make_frame(normal: jnp.ndarray) -> jnp.ndarray:
    """Orthonormal contact frame rows [n, t1, t2] (mju_makeFrame semantics)."""
    n = normal
    # pick a helper axis not parallel to n
    use_y = jnp.abs(n[..., 1]) < 0.5
    b = jnp.where(
        use_y[..., None],
        jnp.array([0.0, 1.0, 0.0], n.dtype),
        jnp.array([0.0, 0.0, 1.0], n.dtype),
    )
    t1 = b - n * jnp.sum(n * b, axis=-1, keepdims=True)
    t1 = t1 / jnp.linalg.norm(t1, axis=-1, keepdims=True)
    t2 = jnp.cross(n, t1)
    return jnp.stack([n, t1, t2], axis=-2)


def _plane_sphere(ppos, pmat, spos, r):
    n = pmat[..., :, 2]
    cdist = jnp.sum(n * (spos - ppos), axis=-1)
    dist = cdist - r
    pos = spos - n * (r + 0.5 * dist)[..., None]
    return dist, pos, make_frame(n)


def _plane_capsule(ppos, pmat, cpos, cmat, size):
    """Two endpoint contacts with the MuJoCo plane-capsule frame.

    MuJoCo aligns the first friction tangent with the capsule axis projected
    onto the plane (engine_collision_primitive.c mjc_PlaneCapsule; verified
    empirically: a capsule yawed 30° on the floor reports t1 = (cos30, sin30)
    for both contacts, while sphere/box-plane contacts use the plain
    mju_makeFrame tangents).  Under the pyramidal cone the tangent directions
    define the friction pyramid edges, so using the generic frame here
    rotates the cone and measurably changes contact forces (the round-2
    crate-scene tail error traced to exactly this).  Near-vertical capsules
    (projection ~0) fall back to the generic frame, like MuJoCo.
    """
    r, half = size[0], size[1]
    axis = cmat[..., :, 2]
    n = pmat[..., :, 2]
    proj = axis - n * jnp.sum(n * axis, axis=-1, keepdims=True)
    plen = jnp.linalg.norm(proj, axis=-1, keepdims=True)
    generic = make_frame(n)
    t1 = jnp.where(plen > 1e-10, proj / jnp.maximum(plen, 1e-30), generic[..., 1, :])
    t2 = jnp.cross(n, t1)
    frame = jnp.stack([n, t1, t2], axis=-2)
    outs = []
    for sgn in (1.0, -1.0):
        end = cpos + sgn * half * axis
        dist, pos, _ = _plane_sphere(ppos, pmat, end, r)
        outs.append((dist, pos, frame))
    return outs


def _plane_box(ppos, pmat, bpos, bmat, size):
    """4 contact slots: the 4 deepest of the 8 corners."""
    n = pmat[..., :, 2]
    corners = []
    for sx in (-1, 1):
        for sy in (-1, 1):
            for sz in (-1, 1):
                local = jnp.stack([sx * size[0], sy * size[1], sz * size[2]])
                corners.append(bpos + bmat @ local)
    corners = jnp.stack(corners)  # (8, 3)
    dists = jnp.sum(n * (corners - ppos), axis=-1)  # (8,)
    order = jnp.argsort(dists)[:4]
    outs = []
    for k in range(4):
        idx = order[k]
        d = dists[idx]
        pos = corners[idx] - 0.5 * d * n
        outs.append((d, pos, make_frame(n)))
    return outs


def _sphere_sphere(p1, r1, p2, r2):
    delta = p2 - p1
    length = jnp.linalg.norm(delta, axis=-1)
    n = delta / jnp.maximum(length, 1e-12)
    # degenerate centers: arbitrary z normal like MuJoCo
    n = jnp.where(length[..., None] < 1e-12, jnp.array([0.0, 0.0, 1.0], p1.dtype), n)
    dist = length - (r1 + r2)
    pos = p1 + n * (r1 + 0.5 * dist)[..., None]
    return dist, pos, make_frame(n)


def _closest_on_segment(a, b, p):
    ab = b - a
    t = jnp.sum((p - a) * ab, axis=-1) / jnp.maximum(jnp.sum(ab * ab, axis=-1), 1e-12)
    t = jnp.clip(t, 0.0, 1.0)
    return a + t[..., None] * ab


def _sphere_capsule(spos, r1, cpos, cmat, size):
    r2, half = size[0], size[1]
    axis = cmat[..., :, 2]
    a, b = cpos - half * axis, cpos + half * axis
    nearest = _closest_on_segment(a, b, spos)
    return _sphere_sphere(spos, r1, nearest, r2)


def sphere_box(spos, r, bpos, bmat, size):
    """Sphere (or point, r=0) vs box.  Returns (dist, pos, frame)."""
    local = bmat.T @ (spos - bpos)
    clamped = jnp.clip(local, -size, size)
    outside = jnp.any(jnp.abs(local) > size)
    # outside: closest point on box surface
    delta_out = local - clamped
    len_out = jnp.linalg.norm(delta_out)
    n_out_local = delta_out / jnp.maximum(len_out, 1e-12)
    dist_out = len_out - r
    pos_out_local = clamped + 0.5 * (dist_out) * n_out_local
    # inside: face with minimal depth
    depths = size - jnp.abs(local)  # (3,) per axis
    ax = jnp.argmin(depths)
    sgn = jnp.sign(local[ax])
    n_in_local = jnp.zeros(3, spos.dtype).at[ax].set(1.0) * sgn
    dist_in = -(depths[ax] + r)
    surface = jnp.where(
        jnp.arange(3) == ax, sgn * size, local
    )
    pos_in_local = surface + 0.5 * dist_in * n_in_local

    dist = jnp.where(outside, dist_out, dist_in)
    n_local = jnp.where(outside, n_out_local, n_in_local)
    pos_local = jnp.where(outside, pos_out_local, pos_in_local)
    # normal points from box(1) into sphere(2) in local frame; world:
    n_world = bmat @ n_local
    pos_world = bpos + bmat @ pos_local
    return dist, pos_world, make_frame(n_world)


def _capsule_capsule(p1, m1, s1, p2, m2, s2):
    r1, h1 = s1[0], s1[1]
    r2, h2 = s2[0], s2[1]
    a1, b1 = p1 - h1 * m1[..., :, 2], p1 + h1 * m1[..., :, 2]
    a2, b2 = p2 - h2 * m2[..., :, 2], p2 + h2 * m2[..., :, 2]
    # closest points between segments (iterative projection, 4 sweeps)
    c2 = p2
    c1 = p1
    for _ in range(4):
        c1 = _closest_on_segment(a1, b1, c2)
        c2 = _closest_on_segment(a2, b2, c1)
    return _sphere_sphere(c1, r1, c2, r2)


def _capsule_box(cpos, cmat, csize, bpos, bmat, bsize):
    """Two approximate contacts: deepest segment point + deeper endpoint.

    When the deepest segment point converges TO an endpoint (a capsule
    hitting the box end-on — the common case for knee/calf capsules vs the
    crate), the two slots would be the SAME contact twice, doubling the
    impulse; MuJoCo emits one contact there (measured: the duplicated row
    was the entire h1-crate parity tail, per-step qvel err up to 0.18).
    The endpoint slot is deactivated (dist=+1) when it coincides with the
    segment slot."""
    r, half = csize[0], csize[1]
    axis = cmat[..., :, 2]
    a, b = cpos - half * axis, cpos + half * axis
    # segment point closest to the box: iterate closest-point projections
    p = bpos
    seg = cpos
    for _ in range(4):
        seg = _closest_on_segment(a, b, p)
        local = jnp.clip(bmat.T @ (seg - bpos), -bsize, bsize)
        p = bpos + bmat @ local
    c0 = sphere_box(seg, r, bpos, bmat, bsize)
    da = sphere_box(a, r, bpos, bmat, bsize)
    db = sphere_box(b, r, bpos, bmat, bsize)
    deeper = jnp.where(da[0] < db[0], 1.0, 0.0)
    c1 = tuple(
        jnp.where(deeper > 0.5, xa, xb) for xa, xb in zip(da[:3], db[:3])
    )
    end = jnp.where(deeper > 0.5, a, b)
    dup = jnp.sum((seg - end) ** 2) < 1e-12
    c1 = (jnp.where(dup, jnp.ones_like(c1[0]), c1[0]), c1[1], c1[2])
    return [c0, c1]


def _box_box(p1, m1, s1, p2, m2, s2):
    """8 approximate contacts: box1 corners inside box2 (no edge-edge)."""
    outs = []
    for sx in (-1, 1):
        for sy in (-1, 1):
            for sz in (-1, 1):
                local = jnp.stack([sx * s1[0], sy * s1[1], sz * s1[2]])
                corner = p1 + m1 @ local
                d, pos, frame = sphere_box(corner, 0.0, p2, m2, s2)
                # flip normal: convention is from geom1 into geom2, but
                # sphere_box returns box→point, i.e. geom2→corner(geom1)
                frame = make_frame(-frame[0])
                outs.append((d, pos, frame))
    return outs


def collide(model: PhysicsModel, kin: Kinematics) -> Contacts:
    """Run narrowphase for every static pair; returns fixed-size Contacts."""
    dists, poss, frames = [], [], []
    sizes = model.geom_size

    def emit(d, p, f):
        dists.append(d)
        poss.append(p)
        frames.append(f)

    for kind in sorted(model.pairs):
        pair = model.pairs[kind]
        t1, t2 = kind
        for i in range(pair.geom1.shape[0]):
            g1, g2 = int(pair.geom1[i]), int(pair.geom2[i])
            p1, m1 = kin.geom_xpos[g1], kin.geom_xmat[g1]
            p2, m2 = kin.geom_xpos[g2], kin.geom_xmat[g2]
            s1 = jnp.asarray(sizes[g1], p1.dtype)
            s2 = jnp.asarray(sizes[g2], p1.dtype)
            if kind == (GEOM_PLANE, GEOM_SPHERE):
                emit(*_plane_sphere(p1, m1, p2, s2[0]))
            elif kind == (GEOM_PLANE, GEOM_CAPSULE):
                for c in _plane_capsule(p1, m1, p2, m2, s2):
                    emit(*c)
            elif kind == (GEOM_PLANE, GEOM_BOX):
                for c in _plane_box(p1, m1, p2, m2, s2):
                    emit(*c)
            elif kind == (GEOM_SPHERE, GEOM_SPHERE):
                emit(*_sphere_sphere(p1, s1[0], p2, s2[0]))
            elif kind == (GEOM_SPHERE, GEOM_CAPSULE):
                emit(*_sphere_capsule(p1, s1[0], p2, m2, s2))
            elif kind == (GEOM_SPHERE, GEOM_BOX):
                d, p, f = sphere_box(p1, s1[0], p2, m2, s2)
                # sphere is geom1: flip box→sphere normal to sphere→?  MuJoCo
                # normal points from geom1 (sphere) into geom2 (box): flip.
                emit(d, p, make_frame(-f[0]))
            elif kind == (GEOM_CAPSULE, GEOM_CAPSULE):
                emit(*_capsule_capsule(p1, m1, s1, p2, m2, s2))
            elif kind == (GEOM_CAPSULE, GEOM_BOX):
                for d, p, f in _capsule_box(p1, m1, s1, p2, m2, s2):
                    emit(d, p, make_frame(-f[0]))
            elif kind == (GEOM_BOX, GEOM_BOX):
                for c in _box_box(p1, m1, s1, p2, m2, s2):
                    emit(*c)
            else:
                raise NotImplementedError(f"pair kind {kind}")

    if not dists:
        z = jnp.zeros((0,))
        return Contacts(dist=z, pos=jnp.zeros((0, 3)), frame=jnp.zeros((0, 3, 3)))
    return Contacts(
        dist=jnp.stack(dists), pos=jnp.stack(poss), frame=jnp.stack(frames)
    )
