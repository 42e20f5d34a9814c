"""Lateral-collision world library: mazes, tunnels, v-chimney.

World-geometry parity for qm_description/urdf/{mazes,tunnel,vchimney} (the
reference's Gazebo collision worlds, STL tri-meshes fixed to the world
frame). The height-field terrains in sim/terrain.py can only represent
z = h(x, y); these worlds need walls, so collision here is point-vs-triangle
penalty contact over the extracted meshes (assets/worlds.json, produced by
tools/extract_worlds.py from the reference STLs + xacro scales):

- collision points = the 4 feet plus trunk proxy spheres (the reference
  collides the trunk/hip collision volumes against the mesh; we cover the
  same volume with spheres at the trunk corners);
- every triangle a sphere overlaps contributes a spring-damper normal force
  (two-sided: thin 0.15 m walls push back toward the side the point is on)
  with Coulomb-clamped tangential damping (mu 0.7, mazes/maze1.xacro:20-21);
- triangle count per world is static (28..410), so the whole query is a
  fixed-shape broadcast that vmaps over scenario batches on the TPU.
"""
from __future__ import annotations

import json
import os
from functools import lru_cache
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..models import kinematics, spatial
from ..models.model import RobotModel

_ASSET = os.path.join(os.path.dirname(__file__), "..", "assets", "worlds.json")

# trunk proxy spheres (base-frame centers, shared radius): AlienGo trunk is
# 0.65 x 0.28 m with the hip/shoulder volumes just outside — four corner
# spheres cover the same footprint
TRUNK_POINTS = np.array([
    [0.33, 0.15, 0.0],
    [0.33, -0.15, 0.0],
    [-0.33, 0.15, 0.0],
    [-0.33, -0.15, 0.0],
])
# keeps ~4 cm clearance per side when centered in tunnel50's 0.98 m passage
# (the reference trunk collision box half-width is 0.14)
TRUNK_RADIUS = 0.12
FOOT_RADIUS = 0.02


class WorldMesh(NamedTuple):
    v0: jnp.ndarray   # (T, 3) first vertex
    e1: jnp.ndarray   # (T, 3) v1 - v0
    e2: jnp.ndarray   # (T, 3) v2 - v0
    n: jnp.ndarray    # (T, 3) unit normal (from winding)


@lru_cache(maxsize=None)
def _load_raw():
    with open(_ASSET) as f:
        return json.load(f)


def world_names():
    return sorted(_load_raw().keys())


@lru_cache(maxsize=None)
def load_world(name: str, offset: tuple = (0.0, 0.0, 0.0)) -> WorldMesh:
    """World mesh, optionally translated by ``offset`` (world placement)."""
    tris = np.asarray(_load_raw()[name], dtype=np.float64).reshape(-1, 3, 3)
    tris = tris + np.asarray(offset)
    v0, v1, v2 = tris[:, 0], tris[:, 1], tris[:, 2]
    e1, e2 = v1 - v0, v2 - v0
    n = np.cross(e1, e2)
    norm = np.linalg.norm(n, axis=-1, keepdims=True)
    keep = norm[:, 0] > 1e-9  # drop degenerate triangles
    n = n[keep] / norm[keep]
    return WorldMesh(
        v0=jnp.asarray(v0[keep]), e1=jnp.asarray(e1[keep]),
        e2=jnp.asarray(e2[keep]), n=jnp.asarray(n),
    )


def sphere_mesh_force(mesh: WorldMesh, p, v_p, radius, stiffness, damping,
                      mu=0.7, tangential_damping=200.0):
    """(3,) contact force on a sphere (center p, velocity v_p) from the mesh.

    Per triangle: signed plane distance d, face-interior test via
    barycentric coordinates; engaged when |d| < radius with the closest
    plane point inside the face. Normal direction = sign(d) * n (two-sided
    walls). Spring-damper normal + velocity-damped tangential force with a
    Coulomb clamp, matching the ground model in sim.py:_contact_forces.
    """
    dtype = p.dtype
    v0 = mesh.v0.astype(dtype)
    e1 = mesh.e1.astype(dtype)
    e2 = mesh.e2.astype(dtype)
    n = mesh.n.astype(dtype)

    w = p[None, :] - v0                       # (T, 3)
    d = jnp.sum(w * n, axis=-1)               # (T,) signed plane distance
    # barycentric coords of the in-plane projection
    a = jnp.sum(e1 * e1, axis=-1)
    b = jnp.sum(e1 * e2, axis=-1)
    c = jnp.sum(e2 * e2, axis=-1)
    du = jnp.sum(w * e1, axis=-1)
    dv = jnp.sum(w * e2, axis=-1)
    det = a * c - b * b
    s = (c * du - b * dv) / jnp.maximum(det, 1e-12)
    t = (a * dv - b * du) / jnp.maximum(det, 1e-12)
    inside = (s >= -1e-3) & (t >= -1e-3) & (s + t <= 1.0 + 1e-3)

    pen = radius - jnp.abs(d)                 # >0 when overlapping
    engaged = inside & (pen > 0.0)
    n_dir = jnp.sign(d)[:, None] * n          # outward (toward the sphere)

    vn = jnp.sum(v_p[None, :] * n_dir, axis=-1)
    fn = jnp.where(engaged, stiffness * pen - damping * vn, 0.0)
    fn = jnp.maximum(fn, 0.0)

    v_t = v_p[None, :] - vn[:, None] * n_dir
    ft = -tangential_damping * v_t * engaged[:, None]
    ft_norm = jnp.linalg.norm(ft, axis=-1, keepdims=True)
    ft_max = mu * fn[:, None]
    scale = jnp.where(ft_norm > ft_max, ft_max / jnp.maximum(ft_norm, 1e-9), 1.0)

    F = fn[:, None] * n_dir + ft * scale      # (T, 3)
    return jnp.sum(F, axis=0)


def world_generalized_forces(model: RobotModel, mesh: WorldMesh, q, v,
                             stiffness=20000.0, damping=300.0, mu=0.7):
    """(24,) generalized force from wall contacts on feet + trunk spheres."""
    dtype = q.dtype
    tau = jnp.zeros(24, dtype=dtype)

    # feet
    p_feet = kinematics.contact_positions(model, q)
    J_feet = kinematics.frame_jacobians(model, q, model.contact_frame_ids)[:, :3, :]
    v_feet = J_feet @ v
    for i in range(4):
        F = sphere_mesh_force(mesh, p_feet[i], v_feet[i], FOOT_RADIUS,
                              stiffness, damping, mu)
        tau = tau + J_feet[i].T @ F

    # trunk proxy spheres (attached to the base body)
    R_base = spatial.zyx_to_rot(q[3:6])
    axes_origins = kinematics.joint_world_axes(model, q)[:2]
    for r_local in TRUNK_POINTS:
        p_w = q[0:3] + spatial.fmv(R_base, jnp.asarray(r_local, dtype))
        J = kinematics.point_jacobian(model, q, 0, p_w, axes_origins)[:3]
        v_w = J @ v
        F = sphere_mesh_force(mesh, p_w, v_w, TRUNK_RADIUS,
                              stiffness, damping, mu)
        tau = tau + J.T @ F
    return tau
