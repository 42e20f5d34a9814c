"""Centroidal model: state/input layout, pinocchio-chart mapping, flow map.

Replaces ocs2_centroidal_model (CentroidalModelInfo / PinocchioMapping /
PinocchioCentroidalDynamics(AD) / CentroidalModelRbdConversions /
weightCompensatingInput) for centroidalModelType = FullCentroidalDynamics
(qm_controllers/config/task.info:1).

State x (30): [ h_com/m : vcom(3), L/m(3) ;  base pose: pos(3), zyx(3) ; q_j(18) ]
Input u (30): [ contact forces LF,RF,LH,RH (12) ; joint velocities (18) ]

rbdState (55), matching qm_estimation/StateEstimateBase.cpp layout:
  [ zyx euler(3); base pos(3); q_j(18); omega_world(3); v_base world(3);
    qdot_j(18); ee pos(3); ee quat xyzw(4) ]
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from . import spatial
from .dynamics import centroidal_momentum_matrix
from .kinematics import ee_pose
from .model import RobotModel, GRAVITY


# --- state/input accessors ------------------------------------------------

def normalized_momentum(x):
    return x[..., 0:6]


def base_pose(x):
    return x[..., 6:12]


def joint_angles(x):
    return x[..., 12:30]


def contact_forces(u):
    return u[..., 0:12].reshape(*u.shape[:-1], 4, 3)


def joint_velocities(u):
    return u[..., 12:30]


def ee_wrench(u):
    """Force-tracking input extension: EE wrench [force(3); torque(3)].

    The extended input u (36) = [foot forces (12); joint velocities (18);
    EE wrench (6)] — appended so every 30-dim accessor stays valid. The
    reference's force-tracking branch (README.md 'three branches' section,
    not in the mounted snapshot) models the arm EE as a 5th contact; here it
    is a full 6-D wrench so door-lever torques are expressible too.
    """
    return u[..., 30:36]


def pinocchio_q(x):
    """Centroidal state -> generalized coordinates q (24)."""
    return x[..., 6:30]


def _base_velocity_from_cmm(model: RobotModel, A, x, u):
    m = jnp.sum(model.body_mass)
    rhs = m * normalized_momentum(x) - spatial.fmv(A[:, 6:], joint_velocities(u))
    # elementwise block-Schur solve: keeps the flow map (and its AD tangents)
    # inside one fused kernel instead of XLA's batched-LU path
    return spatial.solve6_block(A[:, :6], rhs)


@jax.jit
def base_velocity(model: RobotModel, x, u):
    """Floating-base generalized velocity [v_world; zyx rates] from momentum.

    v_b = A_b^{-1} (m h_norm - A_j v_j)   (full centroidal dynamics).
    """
    q = pinocchio_q(x)
    A = centroidal_momentum_matrix(model, q)
    return _base_velocity_from_cmm(model, A, x, u)


@jax.jit
def pinocchio_v(model: RobotModel, x, u):
    """Centroidal (state, input) -> generalized velocity v (24)."""
    return jnp.concatenate([base_velocity(model, x, u), joint_velocities(u)])


@jax.jit
def flow_map(model: RobotModel, x, u):
    """xdot = f(x, u): the centroidal dynamics flow map
    (PinocchioCentroidalDynamicsAD equivalent, QMDynamicsAD.cpp:22-33).

    Written with straight calls to contact_positions / com_position / CMM:
    XLA CSEs the duplicated FK subgraphs, and measurements showed an explicit
    shared-FK rewrite was ~15% SLOWER (it disturbed fusion); keep it simple.
    """
    from .dynamics import com_position
    from .kinematics import contact_positions

    q = pinocchio_q(x)
    m = jnp.sum(model.body_mass)
    F = contact_forces(u)
    p_c = contact_positions(model, q)
    com = com_position(model, q)
    g = jnp.array([0.0, 0.0, -GRAVITY], dtype=x.dtype)
    hdot_lin = jnp.sum(F, axis=0) / m + g
    hdot_ang = jnp.sum(jnp.cross(p_c - com, F), axis=0) / m
    v_b = base_velocity(model, x, u)
    return jnp.concatenate([hdot_lin, hdot_ang, v_b, joint_velocities(u)])


@jax.jit
def flow_map_ft(model: RobotModel, x, u):
    """Force-tracking flow map: centroidal dynamics with the EE wrench as a
    5th contact (u (36), see :func:`ee_wrench`).

    The wrench [F_ee; tau_ee] acts at the arm EE frame: it adds F_ee/m to the
    linear momentum rate and (cross(p_ee - com, F_ee) + tau_ee)/m to the
    angular rate — exactly the foot-force pattern plus the free torque term.
    """
    from .dynamics import com_position
    from .kinematics import contact_positions, ee_pose

    q = pinocchio_q(x)
    m = jnp.sum(model.body_mass)
    F = contact_forces(u)
    W = ee_wrench(u)
    p_c = contact_positions(model, q)
    com = com_position(model, q)
    _, p_ee = ee_pose(model, q)
    g = jnp.array([0.0, 0.0, -GRAVITY], dtype=x.dtype)
    hdot_lin = (jnp.sum(F, axis=0) + W[0:3]) / m + g
    hdot_ang = (
        jnp.sum(jnp.cross(p_c - com, F), axis=0)
        + jnp.cross(p_ee - com, W[0:3]) + W[3:6]
    ) / m
    v_b = base_velocity(model, x, u)
    return jnp.concatenate([hdot_lin, hdot_ang, v_b, joint_velocities(u)])


def flow_map_any(model: RobotModel, x, u):
    """Dispatch on the (static) input width: 30 -> nominal, 36 -> wrench."""
    return flow_map_ft(model, x, u) if u.shape[-1] == 36 else flow_map(model, x, u)


@jax.jit
def flow_map_linearization(model: RobotModel, x, u):
    """(f, dfdx, dfdu) — replaces CppAD codegen'd linearApproximation."""
    f = flow_map(model, x, u)
    dfdx, dfdu = jax.jacfwd(partial(flow_map, model), argnums=(0, 1))(x, u)
    return f, dfdx, dfdu


def weight_compensating_input(model: RobotModel, contact_flags, dtype=None):
    """Nominal input: gravity split equally among stance feet, zero joint vel
    (ocs2_legged_robot utils weightCompensatingInput, QMInitializer.cpp:219)."""
    if dtype is None:
        dtype = model.body_mass.dtype
    flags = jnp.asarray(contact_flags, dtype=dtype)
    n_stance = jnp.maximum(jnp.sum(flags), 1.0)
    fz = jnp.sum(model.body_mass) * GRAVITY / n_stance
    F = jnp.stack(
        [jnp.zeros_like(flags), jnp.zeros_like(flags), flags * fz], axis=-1
    )  # (4,3)
    return jnp.concatenate([F.reshape(-1), jnp.zeros(18, dtype=dtype)])


# --- rbd state conversions ------------------------------------------------

def rbd_to_generalized(rbd):
    """rbdState(55) -> (q(24), v(24)) in the model chart
    (WbcBase::updateMeasured, qm_wbc/src/WbcBase.cpp:150-160)."""
    zyx = rbd[0:3]
    q = jnp.concatenate([rbd[3:6], zyx, rbd[6:24]])
    euler_rates = spatial.world_angvel_to_zyx_rates(zyx, rbd[24:27])
    v = jnp.concatenate([rbd[27:30], euler_rates, rbd[30:48]])
    return q, v


@jax.jit
def centroidal_state_from_rbd(model: RobotModel, rbd):
    """rbdState(55) -> centroidal state x(30)
    (CentroidalModelRbdConversions::computeCentroidalStateFromRbdModel)."""
    q, v = rbd_to_generalized(rbd)
    m = jnp.sum(model.body_mass)
    h_norm = spatial.fmv(centroidal_momentum_matrix(model, q), v) / m
    return jnp.concatenate([h_norm, q])


@jax.jit
def rbd_from_generalized(model: RobotModel, q, v):
    """(q, v) -> rbdState(55) including the FK'd EE pose
    (StateEstimateBase::updateArmEE)."""
    zyx = q[3:6]
    omega_w = spatial.zyx_rates_to_world_angvel(zyx, v[3:6])
    R_ee, p_ee = ee_pose(model, q)
    quat = spatial.rot_to_quat(R_ee)
    return jnp.concatenate([zyx, q[0:3], q[6:24], omega_w, v[0:3], v[6:24], p_ee, quat])
