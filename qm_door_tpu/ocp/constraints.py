"""Hard (projected) state-input equality constraints of the OCP.

Per node, the reference imposes (qm_interface/src/QMInterface.cpp:116-131):
- zero contact force for swing feet            (3 rows/foot, ZeroForceConstraint)
- zero foot velocity for stance feet           (3 rows/foot, ZeroVelocityConstraintCppAd)
- swing-foot normal (z) velocity tracking      (1 row/foot,  NormalVelocityConstraintCppAd)

TPU-first encoding: fixed shapes with masks. The zero-force rows act only on
the force block of u and are eliminated analytically by the solver; the
velocity rows are expressed here as a masked 12-row constraint
  g(x, u) = M .* (v_feet(x, u) - b_ref)         (M from contact flags)
with per-foot rows (x, y, z); stance feet activate all 3 rows with b=0, swing
feet activate only the z row with b = swing z-velocity reference.
positionErrorGain = 0 in the reference config, so no position feedback enters
(QMInterface.cpp:324-334, QMPreComputation.cpp:56-71).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..models import centroidal, kinematics
from ..models.model import RobotModel


def velocity_row_mask(contact_flags):
    """(..., 12) row mask: stance -> (1,1,1), swing -> (0,0,1)."""
    f = contact_flags
    ones = jnp.ones_like(f)
    mask = jnp.stack([f, f, ones], axis=-1)  # (...,4,3)
    return mask.reshape(*f.shape[:-1], 12)


def velocity_rhs(contact_flags, z_vel_ref):
    """(..., 12) right-hand side b: 0 for stance rows, swing z-vel ref on z rows."""
    f = contact_flags
    zeros = jnp.zeros_like(f)
    b = jnp.stack([zeros, zeros, (1.0 - f) * z_vel_ref], axis=-1)
    return b.reshape(*f.shape[:-1], 12)


def foot_velocities(model: RobotModel, x, u):
    """(12,) stacked foot linear velocities in contact order, from (x, u)."""
    q = centroidal.pinocchio_q(x)
    v = centroidal.pinocchio_v(model, x, u)
    J = kinematics.frame_jacobians(model, q, model.contact_frame_ids)  # (4,6,24)
    from ..models import spatial

    return spatial.fmv(J[:, :3, :], v).reshape(12)


def velocity_constraint(model: RobotModel, x, u, contact_flags, z_vel_ref):
    """Masked 12-row equality g(x,u) = 0."""
    mask = velocity_row_mask(contact_flags)
    b = velocity_rhs(contact_flags, z_vel_ref)
    return mask * (foot_velocities(model, x, u) - b)


def velocity_constraint_linearization(model: RobotModel, x, u, contact_flags, z_vel_ref):
    """(g, Gx, Gv) with Gv the Jacobian w.r.t. the joint-velocity block u[12:30].

    The force block never enters foot velocities, so dG/dF = 0 identically and
    the solver eliminates forces separately.
    """
    g = velocity_constraint(model, x, u, contact_flags, z_vel_ref)
    fun = partial(velocity_constraint, model, contact_flags=contact_flags, z_vel_ref=z_vel_ref)
    Gx = jax.jacfwd(fun, argnums=0)(x, u)
    Gu = jax.jacfwd(fun, argnums=1)(x, u)
    return g, Gx, Gu[:, 12:30]
