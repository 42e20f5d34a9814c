"""Hierarchical whole-body controllers (HierarchicalWbc / HierarchicalMpcWbc).

Priority stacks exactly mirror qm_wbc/src/HierarchicalWbc.cpp:182-202 and
HierarchicalMpcWbc.cpp:226-236:

combined (HierarchicalWbc):
  T0 = EoM + torque limits + no-contact motion + friction cone
  T1 = base height + base angular + EE linear + EE angular + 100 * swing
  (first ``arm_init_time`` seconds: T1 is replaced by the arm-joint PD task)
  T2 = contact force + base xy linear

separated (HierarchicalMpcWbc):
  T1 = base height + angular + linear + 100 * swing;  T2 = contact force

Returns cmd = [qdd (24); F (12); tau (18)] like WbcBase::updateCmd.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from ..models.model import RobotModel
from . import tasks as T
from .hoqp import solve_hierarchy


@struct.dataclass
class WbcState:
    """Cross-tick WBC memory (finite-difference joint accelerations)."""

    input_last: jnp.ndarray  # (30,)

    @staticmethod
    def init(dtype=jnp.float64):
        return WbcState(input_last=jnp.zeros(30, dtype=dtype))


def _wbc_common(model, wbc_cfg, state_desired, input_desired, rbd_measured,
                contact_flags, wbc_state: WbcState, period):
    data = T.build_wbc_data(
        model, state_desired, input_desired, rbd_measured, contact_flags,
        wbc_state.input_last, period,
    )
    task0 = T.concat_tasks(
        T.floating_base_eom_task(data),
        T.torque_limits_task(data),
        T.no_contact_motion_task(data),
        T.friction_cone_task(data, wbc_cfg.friction_coefficient),
    )
    return data, task0


def hierarchical_wbc(model: RobotModel, wbc_cfg, state_desired, input_desired,
                     rbd_measured, contact_flags, wbc_state: WbcState, period,
                     use_arm_init: bool | jnp.ndarray = False, qp_iters=None):
    """Combined-system WBC tick. ``use_arm_init``: time < arm_init_time.

    Returns (cmd (54,), new_wbc_state).
    """
    qp_iters = wbc_cfg.qp_iterations if qp_iters is None else qp_iters
    data, task0 = _wbc_common(
        model, wbc_cfg, state_desired, input_desired, rbd_measured,
        contact_flags, wbc_state, period,
    )

    kp_arm = jnp.asarray(wbc_cfg.arm_joint_kp, dtype=data.M.dtype)
    kd_arm = jnp.asarray(wbc_cfg.arm_joint_kd, dtype=data.M.dtype)
    task1_full = T.concat_tasks(
        T.base_height_motion_task(data, wbc_cfg.base_height_kp, wbc_cfg.base_height_kd),
        T.base_angular_motion_task(data, wbc_cfg.base_angular_kp, wbc_cfg.base_angular_kd),
        T.ee_linear_tracking_task(
            data,
            jnp.asarray(wbc_cfg.ee_linear_kp, dtype=data.M.dtype),
            jnp.asarray(wbc_cfg.ee_linear_kd, dtype=data.M.dtype),
        ),
        T.ee_angular_tracking_task(
            data,
            jnp.asarray(wbc_cfg.ee_angular_kp, dtype=data.M.dtype),
            jnp.asarray(wbc_cfg.ee_angular_kd, dtype=data.M.dtype),
        ),
        T.scale_task(T.swing_leg_task(data, wbc_cfg.swing_kp, wbc_cfg.swing_kd),
                     wbc_cfg.swing_task_weight),
    )
    task_init = T.arm_joint_tracking_task(data, kp_arm, kd_arm)
    # Fixed-shape select between the two T1 variants: pad the init task to the
    # full task1 row count (22) with zero rows.
    pad_rows = task1_full.A.shape[0] - task_init.A.shape[0]
    task_init_padded = T.Task(
        jnp.concatenate([task_init.A, jnp.zeros((pad_rows, T.N_DEC), dtype=data.M.dtype)]),
        jnp.concatenate([task_init.b, jnp.zeros(pad_rows, dtype=data.M.dtype)]),
        task1_full.D, task1_full.f,
    )
    use_init = jnp.asarray(use_arm_init)
    task1 = T.Task(
        jnp.where(use_init, task_init_padded.A, task1_full.A),
        jnp.where(use_init, task_init_padded.b, task1_full.b),
        task1_full.D, task1_full.f,
    )

    task2 = T.concat_tasks(
        T.contact_force_task(data),
        T.base_linear_motion_task(data, wbc_cfg.base_linear_kp, wbc_cfg.base_linear_kd),
    )

    x_opt = solve_hierarchy([task0, task1, task2], qp_iters=qp_iters)
    tau = T.compute_torque(data, x_opt)
    cmd = jnp.concatenate([x_opt, tau])
    return cmd, WbcState(input_last=input_desired)


def hierarchical_mpc_wbc(model: RobotModel, wbc_cfg, state_desired, input_desired,
                         rbd_measured, contact_flags, wbc_state: WbcState, period,
                         qp_iters=None):
    """Separated-system WBC tick (HierarchicalMpcWbc)."""
    qp_iters = wbc_cfg.qp_iterations if qp_iters is None else qp_iters
    data, task0 = _wbc_common(
        model, wbc_cfg, state_desired, input_desired, rbd_measured,
        contact_flags, wbc_state, period,
    )
    task1 = T.concat_tasks(
        T.base_height_motion_task(data, wbc_cfg.base_height_kp, wbc_cfg.base_height_kd),
        T.base_angular_motion_task(data, wbc_cfg.base_angular_kp, wbc_cfg.base_angular_kd),
        T.base_linear_motion_task(data, wbc_cfg.base_linear_kp, wbc_cfg.base_linear_kd),
        T.scale_task(T.swing_leg_task(data, wbc_cfg.swing_kp, wbc_cfg.swing_kd),
                     wbc_cfg.swing_task_weight),
    )
    task2 = T.contact_force_task(data)
    x_opt = solve_hierarchy([task0, task1, task2], qp_iters=qp_iters)
    tau = T.compute_torque(data, x_opt)
    cmd = jnp.concatenate([x_opt, tau])
    return cmd, WbcState(input_last=input_desired)
