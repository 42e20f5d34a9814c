"""WBC task formulations (qm_wbc/src/WbcBase.cpp replacement).

Decision variables x = [qddot (24); F (12)], n = 36
(WbcBase.cpp:37 numDecisionVars). All tasks are pure functions of a
precomputed ``WbcData``; contact-dependent rows are masked, never reshaped.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from ..models import centroidal, dynamics, kinematics, spatial
from ..models.model import RobotModel
from .hoqp import Task

N_DEC = 36
NQ = 24


@struct.dataclass
class WbcData:
    """Everything the task formulations need (one WBC tick)."""

    contact_flags: jnp.ndarray    # (4,)
    # measured
    q_meas: jnp.ndarray           # (24,)
    v_meas: jnp.ndarray           # (24,)
    M: jnp.ndarray                # (24,24) mass matrix
    nle: jnp.ndarray              # (24,)
    Jc: jnp.ndarray               # (12,24) stacked foot linear Jacobians
    dJc: jnp.ndarray              # (12,24)
    base_J: jnp.ndarray           # (6,24)
    base_dJ: jnp.ndarray          # (6,24)
    arm_J: jnp.ndarray            # (6,24) EE frame
    arm_dJ: jnp.ndarray           # (6,24)
    foot_pos_meas: jnp.ndarray    # (4,3)
    foot_vel_meas: jnp.ndarray    # (4,3)
    ee_pos_meas: jnp.ndarray      # (3,)
    ee_vel_meas: jnp.ndarray      # (6,) [lin; ang]
    ee_rot_meas: jnp.ndarray      # (3,3)
    # desired
    q_des: jnp.ndarray            # (24,)
    v_des: jnp.ndarray            # (24,)
    base_acc_des: jnp.ndarray     # (6,) [lin; euler-rate dot]
    foot_pos_des: jnp.ndarray     # (4,3)
    foot_vel_des: jnp.ndarray     # (4,3)
    ee_pos_des: jnp.ndarray
    ee_vel_des: jnp.ndarray       # (6,)
    ee_rot_des: jnp.ndarray
    force_des: jnp.ndarray        # (12,) MPC contact forces
    torque_limits: jnp.ndarray    # (18,)
    wrench_des: jnp.ndarray = None  # (6,) MPC EE wrench (force-tracking only)


def build_wbc_data(
    model: RobotModel,
    state_desired,
    input_desired,
    rbd_measured,
    contact_flags,
    input_last,
    period,
) -> WbcData:
    """updateMeasured + updateDesired (WbcBase.cpp:146-238)."""
    q_meas, v_meas = centroidal.rbd_to_generalized(rbd_measured)

    M = dynamics.mass_matrix(model, q_meas)
    nle = dynamics.nonlinear_effects(model, q_meas, v_meas)

    foot_ids = model.contact_frame_ids
    Jfeet = kinematics.frame_jacobians(model, q_meas, foot_ids)      # (4,6,24)
    dJfeet = kinematics.frame_jacobians_dot(model, q_meas, v_meas, foot_ids)
    Jc = Jfeet[:, :3, :].reshape(12, NQ)
    dJc = dJfeet[:, :3, :].reshape(12, NQ)

    ba_ids = (model.base_frame_id, model.ee_frame_id)
    Jba = kinematics.frame_jacobians(model, q_meas, ba_ids)
    dJba = kinematics.frame_jacobians_dot(model, q_meas, v_meas, ba_ids)

    Rf_m, pf_m = kinematics.frame_placements(model, q_meas)
    foot_pos_meas = jnp.stack([pf_m[i] for i in foot_ids])
    foot_vel_meas = (Jfeet[:, :3, :] @ v_meas)
    ee_pos_meas = pf_m[model.ee_frame_id]
    ee_rot_meas = Rf_m[model.ee_frame_id]
    ee_vel_meas = Jba[1] @ v_meas

    # desired side (FK at the MPC optimal state/input)
    q_des = centroidal.pinocchio_q(state_desired)
    v_des = centroidal.pinocchio_v(model, state_desired, input_desired)
    Rf_d, pf_d = kinematics.frame_placements(model, q_des)
    Jfeet_d = kinematics.frame_jacobians(model, q_des, foot_ids)
    Jee_d = kinematics.frame_jacobians(model, q_des, (model.ee_frame_id,))[0]
    foot_pos_des = jnp.stack([pf_d[i] for i in foot_ids])
    foot_vel_des = Jfeet_d[:, :3, :] @ v_des
    ee_pos_des = pf_d[model.ee_frame_id]
    ee_rot_des = Rf_d[model.ee_frame_id]
    ee_vel_des = Jee_d @ v_des

    # desired base acceleration from the centroidal momentum rate
    # (WbcBase::updateDesired, WbcBase.cpp:225-238)
    m_tot = jnp.sum(model.body_mass)
    joint_acc = (input_desired[12:30] - input_last[12:30]) / period
    A = dynamics.centroidal_momentum_matrix(model, q_des)
    Adot = dynamics.centroidal_momentum_matrix_dot(model, q_des, v_des)
    h_norm_rate = centroidal.flow_map_any(model, state_desired, input_desired)[0:6]
    rate = m_tot * h_norm_rate - Adot @ v_des - A[:, 6:] @ joint_acc
    base_acc_des = spatial.solve6_block(A[:, :6], rate)

    return WbcData(
        contact_flags=contact_flags,
        q_meas=q_meas, v_meas=v_meas, M=M, nle=nle, Jc=Jc, dJc=dJc,
        base_J=Jba[0], base_dJ=dJba[0], arm_J=Jba[1], arm_dJ=dJba[1],
        foot_pos_meas=foot_pos_meas, foot_vel_meas=foot_vel_meas,
        ee_pos_meas=ee_pos_meas, ee_vel_meas=ee_vel_meas, ee_rot_meas=ee_rot_meas,
        q_des=q_des, v_des=v_des, base_acc_des=base_acc_des,
        foot_pos_des=foot_pos_des, foot_vel_des=foot_vel_des,
        ee_pos_des=ee_pos_des, ee_vel_des=ee_vel_des, ee_rot_des=ee_rot_des,
        force_des=input_desired[0:12],
        torque_limits=model.effort_limit,
        wrench_des=(input_desired[30:36] if input_desired.shape[-1] == 36
                    else jnp.zeros(6, dtype=q_meas.dtype)),
    )


def _empty(dtype):
    return jnp.zeros((0, N_DEC), dtype=dtype), jnp.zeros((0,), dtype=dtype)


def floating_base_eom_task(d: WbcData) -> Task:
    """[M_b, -J_b^T] x = -h_b (WbcBase.cpp:370-388)."""
    A = jnp.concatenate([d.M[:6, :], -d.Jc.T[:6, :]], axis=1)
    b = -d.nle[:6]
    De, fe = _empty(A.dtype)
    return Task(A, b, De, fe)


def torque_limits_task(d: WbcData) -> Task:
    """|M_j x_qdd - J_j^T F + h_j| <= tau_lim (WbcBase.cpp:392-415)."""
    Mj = d.M[6:, :]
    JjT = d.Jc.T[6:, :]
    hj = d.nle[6:]
    row = jnp.concatenate([Mj, -JjT], axis=1)
    D = jnp.concatenate([row, -row], axis=0)
    f = jnp.concatenate([d.torque_limits - hj, d.torque_limits + hj])
    Ae, be = _empty(D.dtype)
    return Task(Ae, be, D, f)


def no_contact_motion_task(d: WbcData) -> Task:
    """J_c x_qdd = -dJ_c v for stance feet (masked rows; WbcBase.cpp:418-433)."""
    mask = jnp.repeat(d.contact_flags, 3)[:, None]
    A = mask * jnp.concatenate([d.Jc, jnp.zeros((12, 12), dtype=d.Jc.dtype)], axis=1)
    b = (mask[:, 0]) * (-(d.dJc @ d.v_meas))
    De, fe = _empty(A.dtype)
    return Task(A, b, De, fe)


def friction_cone_task(d: WbcData, friction_coeff) -> Task:
    """Swing feet: F = 0 (equality). Stance feet: pyramid D F <= 0
    (WbcBase.cpp:439-469). Masked fixed-shape encoding: 12 eq rows + 20 ineq."""
    dtype = d.Jc.dtype
    swing = jnp.repeat(1.0 - d.contact_flags, 3)
    A = swing[:, None] * jnp.concatenate(
        [jnp.zeros((12, NQ), dtype=dtype), jnp.eye(12, dtype=dtype)], axis=1
    )
    b = jnp.zeros(12, dtype=dtype)

    pyramid = jnp.array(
        [
            [0.0, 0.0, -1.0],
            [1.0, 0.0, -friction_coeff],
            [-1.0, 0.0, -friction_coeff],
            [0.0, 1.0, -friction_coeff],
            [0.0, -1.0, -friction_coeff],
        ],
        dtype=dtype,
    )
    blocks = []
    for i in range(4):
        Dk = jnp.zeros((5, N_DEC), dtype=dtype)
        Dk = Dk.at[:, NQ + 3 * i : NQ + 3 * i + 3].set(pyramid)
        blocks.append(d.contact_flags[i] * Dk)
    D = jnp.concatenate(blocks, axis=0)
    # Masked (swing) rows become 0 <= margin: use +1 so they never activate.
    f = jnp.repeat(1.0 - d.contact_flags, 5)
    return Task(A, b, D, f)


def base_linear_motion_task(d: WbcData, kp, kd) -> Task:
    """xy base acceleration PD (WbcBase.cpp formulateBaseLinearMotionTask)."""
    dtype = d.M.dtype
    A = jnp.zeros((2, N_DEC), dtype=dtype).at[:, 0:2].set(jnp.eye(2, dtype=dtype))
    b = (
        d.base_acc_des[0:2]
        + kp * (d.q_des[0:2] - d.q_meas[0:2])
        + kd * (d.v_des[0:2] - d.v_meas[0:2])
    )
    De, fe = _empty(dtype)
    return Task(A, b, De, fe)


def base_xy_linear_accel_task(d: WbcData) -> Task:
    """Pure feedforward xy base acceleration (formulateBaseXYLinearAccelTask;
    defined by the reference but unused in its shipped hierarchies)."""
    dtype = d.M.dtype
    A = jnp.zeros((2, N_DEC), dtype=dtype).at[:, 0:2].set(jnp.eye(2, dtype=dtype))
    b = d.base_acc_des[0:2]
    De, fe = _empty(dtype)
    return Task(A, b, De, fe)


def base_height_motion_task(d: WbcData, kp, kd) -> Task:
    dtype = d.M.dtype
    A = jnp.zeros((1, N_DEC), dtype=dtype).at[0, 2].set(1.0)
    b = jnp.array(
        [
            d.base_acc_des[2]
            + kp * (d.q_des[2] - d.q_meas[2])
            + kd * (d.v_des[2] - d.v_meas[2])
        ],
        dtype=dtype,
    )
    De, fe = _empty(dtype)
    return Task(A, b, De, fe)


def base_angular_motion_task(d: WbcData, kp, kd) -> Task:
    """World-frame angular acceleration PD with rotation error
    (WbcBase.cpp formulateBaseAngularMotionTask)."""
    dtype = d.M.dtype
    A = jnp.zeros((3, N_DEC), dtype=dtype).at[:, 0:NQ].set(d.base_J[3:6, :])

    zyx = d.q_meas[3:6]
    w_meas = spatial.zyx_rates_to_world_angvel(zyx, d.v_meas[3:6])
    w_des = spatial.zyx_rates_to_world_angvel(zyx, d.v_des[3:6])
    R_meas = spatial.zyx_to_rot(zyx)
    R_des = spatial.zyx_to_rot(d.q_des[3:6])
    err = spatial.rotation_error_world(R_des, R_meas)
    acc_des = spatial.world_angacc_from_zyx(zyx, d.v_des[3:6], d.base_acc_des[3:6])
    b = acc_des + kp * err + kd * (w_des - w_meas) - d.base_dJ[3:6, :] @ d.v_meas
    De, fe = _empty(dtype)
    return Task(A, b, De, fe)


def swing_leg_task(d: WbcData, kp, kd) -> Task:
    """Swing foot acceleration PD, masked by (1 - contact)
    (WbcBase.cpp formulateSwingLegTask)."""
    dtype = d.M.dtype
    mask = jnp.repeat(1.0 - d.contact_flags, 3)[:, None]
    A = mask * jnp.concatenate([d.Jc, jnp.zeros((12, 12), dtype=dtype)], axis=1)
    accel = kp * (d.foot_pos_des - d.foot_pos_meas) + kd * (d.foot_vel_des - d.foot_vel_meas)
    b = mask[:, 0] * (accel.reshape(12) - d.dJc @ d.v_meas)
    De, fe = _empty(dtype)
    return Task(A, b, De, fe)


def arm_joint_tracking_task(d: WbcData, kp, kd) -> Task:
    """Arm joint acceleration PD (formulateArmJointNomalTrackingTask)."""
    dtype = d.M.dtype
    A = jnp.zeros((6, N_DEC), dtype=dtype).at[:, NQ - 6 : NQ].set(jnp.eye(6, dtype=dtype))
    b = kp * (d.q_des[NQ - 6 :] - d.q_meas[NQ - 6 :]) + kd * (
        d.v_des[NQ - 6 :] - d.v_meas[NQ - 6 :]
    )
    De, fe = _empty(dtype)
    return Task(A, b, De, fe)


def ee_linear_tracking_task(d: WbcData, kp, kd) -> Task:
    """EE linear acceleration PD (formulateEeLinearMotionTrackingTask)."""
    dtype = d.M.dtype
    A = jnp.zeros((3, N_DEC), dtype=dtype).at[:, 0:NQ].set(d.arm_J[0:3, :])
    acc = kp * (d.ee_pos_des - d.ee_pos_meas) + kd * (d.ee_vel_des[:3] - d.ee_vel_meas[:3])
    b = acc - d.arm_dJ[0:3, :] @ d.v_meas
    De, fe = _empty(dtype)
    return Task(A, b, De, fe)


def ee_angular_tracking_task(d: WbcData, kp, kd) -> Task:
    """EE angular acceleration PD in world frame, with the base-orientation
    columns zeroed exactly as the reference does
    (formulateEeAngularMotionTrackingTask: a.block(0,3,3,3).setZero() and the
    matching dJ block; desired EE angular velocity is computed but unused —
    b uses -omega_meas)."""
    dtype = d.M.dtype
    Jang = d.arm_J[3:6, :].at[:, 3:6].set(0.0)
    dJang = d.arm_dJ[3:6, :].at[:, 3:6].set(0.0)
    A = jnp.zeros((3, N_DEC), dtype=dtype).at[:, 0:NQ].set(Jang)
    err = spatial.rotation_error_world(d.ee_rot_des, d.ee_rot_meas)
    b = kp * err + kd * (-d.ee_vel_meas[3:6]) - dJang @ d.v_meas
    De, fe = _empty(dtype)
    return Task(A, b, De, fe)


def contact_force_task(d: WbcData) -> Task:
    """F = F_mpc (formulateContactForceTask)."""
    dtype = d.M.dtype
    A = jnp.concatenate(
        [jnp.zeros((12, NQ), dtype=dtype), jnp.eye(12, dtype=dtype)], axis=1
    )
    b = d.force_des
    De, fe = _empty(dtype)
    return Task(A, b, De, fe)


def concat_tasks(*tasks: Task) -> Task:
    return Task(
        jnp.concatenate([t.A for t in tasks], axis=0),
        jnp.concatenate([t.b for t in tasks]),
        jnp.concatenate([t.D for t in tasks], axis=0),
        jnp.concatenate([t.f for t in tasks]),
    )


def scale_task(t: Task, s) -> Task:
    return Task(s * t.A, s * t.b, t.D, t.f)


def compute_torque(d: WbcData, x_opt):
    """tau = M_j qdd + h_j - J_j^T F (WbcBase::updateCmd)."""
    qdd = x_opt[:NQ]
    F = x_opt[NQ:]
    return d.M[6:, :] @ qdd + d.nle[6:] - d.Jc.T[6:, :] @ F
