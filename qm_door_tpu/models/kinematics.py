"""Forward kinematics and frame Jacobians (pure JAX, single-sample; vmap to batch).

Replaces pinocchio's forwardKinematics / updateFramePlacements /
getFrameJacobian(LOCAL_WORLD_ALIGNED) / getFrameJacobianTimeVariation as used
by the reference WBC and precomputation (qm_wbc/src/WbcBase.cpp:146-203,
qm_interface/src/QMPreComputation.cpp:73-88).

Generalized coordinates: see models/model.py. In this chart qdot == v, so
time-derivatives of configuration-dependent quantities are plain jvp's along v.

All Jacobians are LOCAL_WORLD_ALIGNED: rows [linear(3); angular(3)], world
axes, taken at the frame origin.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from . import spatial
from .model import RobotModel


def _axis_rot(axis, angle):
    """Rodrigues rotation about a (constant) unit axis."""
    K = spatial.skew(axis)
    s, c = jnp.sin(angle), jnp.cos(angle)
    return jnp.eye(3, dtype=angle.dtype) + s * K + (1.0 - c) * spatial.fmm(K, K)


@jax.jit
def fk(model: RobotModel, q):
    """Body poses in world frame.

    Returns (R, p): stacked (19,3,3) rotations and (19,3) positions.
    Body 0 is the floating base; body 1+i is the child body of joint i.
    """
    base_R = spatial.zyx_to_rot(q[3:6])
    base_p = q[0:3]
    Rs = [base_R]
    ps = [base_p]
    for i in range(model.nj):
        par = model.joint_parent[i]
        Rp, pp = Rs[par], ps[par]
        Rj = spatial.fmm(Rp, model.joint_rot[i])
        pj = spatial.fmv(Rp, model.joint_trans[i]) + pp
        Rs.append(spatial.fmm(Rj, _axis_rot(model.joint_axis[i], q[6 + i])))
        ps.append(pj)
    return jnp.stack(Rs), jnp.stack(ps)


@jax.jit
def joint_world_axes(model: RobotModel, q):
    """World-frame joint axes and joint-origin positions, (18,3) each."""
    R, p = fk(model, q)
    axes = []
    origins = []
    for i in range(model.nj):
        par = model.joint_parent[i]
        axes.append(spatial.fmv(R[par], model.joint_rot[i] @ model.joint_axis[i]))
        origins.append(spatial.fmv(R[par], model.joint_trans[i]) + p[par])
    return jnp.stack(axes), jnp.stack(origins), (R, p)


from functools import lru_cache


@lru_cache(maxsize=None)
def _ancestor_mask_cached(joint_parent: tuple):
    """(n_bodies, nj) static 0/1 table: joint j moves body b.

    Body 1+i is moved by joint i and every ancestor joint of i.
    """
    import numpy as np

    nj = len(joint_parent)
    mask = np.zeros((nj + 1, nj), dtype=bool)
    for i in range(nj):
        b = 1 + i
        j = i
        while True:
            mask[b, j] = True
            parent_body = joint_parent[j]
            if parent_body == 0:
                break
            j = parent_body - 1
    return mask


def _ancestor_mask(model: RobotModel):
    return _ancestor_mask_cached(tuple(model.joint_parent))


def point_jacobian(model: RobotModel, q, body_idx, point_w, axes_origins=None):
    """6x24 LOCAL_WORLD_ALIGNED Jacobian of a world-point attached to a body."""
    if axes_origins is None:
        axes, origins, _ = joint_world_axes(model, q)
    else:
        axes, origins = axes_origins
    dtype = q.dtype
    E = spatial.zyx_rates_to_world_angvel_matrix(q[3:6])
    base_p = q[0:3]

    # base translation (cols 0-2)
    Jlin = [jnp.eye(3, dtype=dtype)]
    Jang = [jnp.zeros((3, 3), dtype=dtype)]
    # base orientation (cols 3-5): omega = E @ etadot; v_point = omega x (p - p_base)
    r = point_w - base_p
    Jlin.append(-spatial.fmm(spatial.skew(r), E))
    Jang.append(E)
    # joints (static sparsity: only ancestor joints contribute)
    mask = _ancestor_mask(model)[body_idx]
    zero3 = jnp.zeros(3, dtype=dtype)
    cols_lin = []
    cols_ang = []
    for i in range(model.nj):
        if mask[i]:
            cols_ang.append(axes[i])
            cols_lin.append(jnp.cross(axes[i], point_w - origins[i]))
        else:
            cols_ang.append(zero3)
            cols_lin.append(zero3)
    Jlin.append(jnp.stack(cols_lin, axis=-1))
    Jang.append(jnp.stack(cols_ang, axis=-1))
    return jnp.concatenate(
        [jnp.concatenate(Jlin, axis=-1), jnp.concatenate(Jang, axis=-1)], axis=0
    )


@jax.jit
def frame_placements(model: RobotModel, q, fk_out=None):
    """World poses of all exported frames: (F,3,3), (F,3)."""
    if fk_out is None:
        fk_out = fk(model, q)
    R, p = fk_out
    Rf = []
    pf = []
    for f in range(len(model.frame_names)):
        par = model.frame_parent[f]
        Rf.append(spatial.fmm(R[par], model.frame_rot[f]))
        pf.append(spatial.fmv(R[par], model.frame_trans[f]) + p[par])
    return jnp.stack(Rf), jnp.stack(pf)


@partial(jax.jit, static_argnames=("frame_ids",))
def frame_jacobians(model: RobotModel, q, frame_ids=None):
    """Stacked 6x24 LWA Jacobians for the requested frames (default: all).

    Returns (F, 6, 24) with rows [linear; angular].
    """
    if frame_ids is None:
        frame_ids = tuple(range(len(model.frame_names)))
    axes, origins, fk_out = joint_world_axes(model, q)
    _, pf = frame_placements(model, q, fk_out)
    Js = []
    for f in frame_ids:
        Js.append(
            point_jacobian(model, q, model.frame_parent[f], pf[f], (axes, origins))
        )
    return jnp.stack(Js)


@partial(jax.jit, static_argnames=("frame_ids",))
def frame_jacobians_dot(model: RobotModel, q, v, frame_ids=None):
    """dJ/dt for the requested frames: jvp of frame_jacobians along qdot = v."""
    fun = partial(frame_jacobians, model, frame_ids=frame_ids)
    _, Jdot = jax.jvp(fun, (q,), (v,))
    return Jdot


@partial(jax.jit, static_argnames=("frame_ids",))
def frame_velocities(model: RobotModel, q, v, frame_ids=None):
    """(F, 6) spatial velocities [linear; angular] in world axes."""
    J = frame_jacobians(model, q, frame_ids)
    return spatial.fmv(J, v)


@jax.jit
def contact_positions(model: RobotModel, q):
    """(4,3) world positions of the feet in contact order LF, RF, LH, RH."""
    _, pf = frame_placements(model, q)
    return jnp.stack([pf[i] for i in model.contact_frame_ids])


@jax.jit
def ee_pose(model: RobotModel, q):
    """(R, p) of the arm end-effector frame."""
    Rf, pf = frame_placements(model, q)
    return Rf[model.ee_frame_id], pf[model.ee_frame_id]
