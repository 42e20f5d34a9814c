"""Self-collision soft constraint (ocs2_self_collision role).

The reference declares a PinocchioGeometryInterface for self-collision
(QMInterface.h:19,50,89) but never instantiates the constraint; here the
equivalent is implemented and OFF by default (cfg.cost.self_collision_mu=0),
matching the reference's shipped behavior while making the capability real.

Geometry: spheres attached to the kinematic tree (the role of the URDF
collision primitives ocs2 loads through hpp-fcl), pairs = the arm's distal
spheres against the legs — the only self-collisions the combined
quadruped+arm plant can realistically produce (leg-leg crossings are
excluded by the joint limits; arm-trunk proximity is nominal by design,
the mount keeps the elbow near the torso).

Penalty: relaxed barrier on h = dist(pair) - (r_i + r_j + margin), the same
penalty family and Gauss-Newton quadratization order as the EE soft
constraint (ocs2 soft-constraint convention).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models import kinematics
from ..models.model import RobotModel
from . import penalties

# sphere attachments: (kind, index, radius)
#   kind "body" = body origin (1..18 joint child bodies), "foot" = contact
#   frame, "ee" = end-effector frame
# arm distal spheres: elbow-forward link (body 15), wrist (body 17), gripper
ARM_SPHERES = (("body", 15, 0.05), ("body", 17, 0.05), ("ee", 0, 0.06))
# leg spheres: calves (KFE child bodies 3/6/9/12) and feet
LEG_SPHERES = (("body", 3, 0.045), ("body", 6, 0.045), ("body", 9, 0.045),
               ("body", 12, 0.045),
               ("foot", 0, 0.02), ("foot", 1, 0.02), ("foot", 2, 0.02),
               ("foot", 3, 0.02))


def _sphere_positions(model: RobotModel, q):
    """Stacked world positions for ARM_SPHERES + LEG_SPHERES."""
    _, p_bodies = kinematics.fk(model, q)
    p_feet = kinematics.contact_positions(model, q)
    _, p_ee = kinematics.ee_pose(model, q)

    def pos(kind, idx):
        if kind == "body":
            return p_bodies[idx]
        if kind == "foot":
            return p_feet[idx]
        return p_ee

    pts = [pos(k, i) for (k, i, _) in ARM_SPHERES + LEG_SPHERES]
    return jnp.stack(pts)


def pair_clearances(model: RobotModel, q, margin: float = 0.0):
    """(n_arm * n_leg,) signed clearances h = dist - r_sum - margin."""
    pts = _sphere_positions(model, q)
    na = len(ARM_SPHERES)
    arm, leg = pts[:na], pts[na:]
    r_arm = jnp.asarray([r for (_, _, r) in ARM_SPHERES], dtype=q.dtype)
    r_leg = jnp.asarray([r for (_, _, r) in LEG_SPHERES], dtype=q.dtype)
    d = jnp.linalg.norm(arm[:, None, :] - leg[None, :, :] + 1e-12, axis=-1)
    h = d - (r_arm[:, None] + r_leg[None, :]) - margin
    return h.reshape(-1)


def self_collision_cost(model: RobotModel, ocp, x):
    """Stage-cost contribution: sum of relaxed barriers over the pairs."""
    q = x[6:30]
    h = pair_clearances(model, q, ocp.self_collision_margin)
    return jnp.sum(penalties.relaxed_barrier(
        h, ocp.self_collision_mu, ocp.self_collision_delta))


def quadratize_self_collision(model: RobotModel, ocp, x):
    """(l, lx (30,), lxx (30,30)) Gauss-Newton quadratization (the ocs2
    Linear-order soft-constraint convention: exact gradient, J^T p'' J
    Hessian — no second kinematic derivatives)."""
    q = x[6:30]
    mu, delta = ocp.self_collision_mu, ocp.self_collision_delta

    def h_fn(qq):
        return pair_clearances(model, qq, ocp.self_collision_margin)

    h = h_fn(q)
    J = jax.jacfwd(h_fn)(q)                       # (P, 24)
    p = jnp.sum(penalties.relaxed_barrier(h, mu, delta))
    pd = penalties.relaxed_barrier_d(h, mu, delta)
    pdd = penalties.relaxed_barrier_dd(h, mu, delta)

    g_q = J.T @ pd                                 # (24,)
    H_q = (J.T * pdd[None, :]) @ J                 # (24, 24) GN
    lx = jnp.zeros(30, dtype=x.dtype).at[6:30].set(g_q)
    lxx = jnp.zeros((30, 30), dtype=x.dtype).at[6:30, 6:30].set(H_q)
    return p, lx, lxx
