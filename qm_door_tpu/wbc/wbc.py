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
from .hoqp import solve_hierarchy, solve_hierarchy_batched


@struct.dataclass
class WbcGains:
    """Live-tunable WBC gains as a pytree (dynamic_reconfigure parity,
    qm_wbc/cfg/wbcWigeht.cfg + WbcBase::dynamicCallback WbcBase.cpp:74-121).

    Pass an instance as ``wbc_cfg`` into a jitted tick: the gains become
    traced inputs, so swapping values at runtime re-uses the compiled
    executable (same shapes/treedef -> no retrace). ``qp_iterations`` and
    ``arm_init_time`` stay static (they change control flow)."""

    swing_kp: jnp.ndarray
    swing_kd: jnp.ndarray
    base_height_kp: jnp.ndarray
    base_height_kd: jnp.ndarray
    base_linear_kp: jnp.ndarray
    base_linear_kd: jnp.ndarray
    base_angular_kp: jnp.ndarray
    base_angular_kd: jnp.ndarray
    arm_joint_kp: jnp.ndarray   # (6,)
    arm_joint_kd: jnp.ndarray   # (6,)
    ee_linear_kp: jnp.ndarray   # (3,)
    ee_linear_kd: jnp.ndarray   # (3,)
    ee_angular_kp: jnp.ndarray  # (3,)
    ee_angular_kd: jnp.ndarray  # (3,)
    swing_task_weight: jnp.ndarray
    friction_coefficient: jnp.ndarray
    qp_iterations: int = struct.field(pytree_node=False, default=30)
    arm_init_time: float = struct.field(pytree_node=False, default=10.0)

    @classmethod
    def from_settings(cls, ws, dtype=jnp.float32):
        """Build from config.WbcSettings."""
        arr = lambda v: jnp.asarray(v, dtype=dtype)
        return cls(
            swing_kp=arr(ws.swing_kp), swing_kd=arr(ws.swing_kd),
            base_height_kp=arr(ws.base_height_kp), base_height_kd=arr(ws.base_height_kd),
            base_linear_kp=arr(ws.base_linear_kp), base_linear_kd=arr(ws.base_linear_kd),
            base_angular_kp=arr(ws.base_angular_kp), base_angular_kd=arr(ws.base_angular_kd),
            arm_joint_kp=arr(ws.arm_joint_kp), arm_joint_kd=arr(ws.arm_joint_kd),
            ee_linear_kp=arr(ws.ee_linear_kp), ee_linear_kd=arr(ws.ee_linear_kd),
            ee_angular_kp=arr(ws.ee_angular_kp), ee_angular_kd=arr(ws.ee_angular_kd),
            swing_task_weight=arr(ws.swing_task_weight),
            friction_coefficient=arr(ws.friction_coefficient),
            qp_iterations=ws.qp_iterations,
            arm_init_time=ws.arm_init_time,
        )


@struct.dataclass
class WbcState:
    """Cross-tick WBC memory (finite-difference joint accelerations)."""

    input_last: jnp.ndarray  # (nu,) — 30 nominal, 36 force-tracking

    @staticmethod
    def init(dtype=jnp.float64, nu: int = 30):
        return WbcState(input_last=jnp.zeros(nu, dtype=dtype))


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


def combined_tasks(model: RobotModel, wbc_cfg, state_desired, input_desired,
                   rbd_measured, contact_flags, wbc_state: WbcState, period,
                   use_arm_init: bool | jnp.ndarray = False,
                   arm_locked: bool = False):
    """Build the combined-system priority stack. Returns (data, [T0,T1,T2]).

    Pure task formulation (no QP solve) so batched callers can vmap it and
    hand the stacked tasks to :func:`..hoqp.solve_hierarchy_batched`."""
    data, task0 = _wbc_common(
        model, wbc_cfg, state_desired, input_desired, rbd_measured,
        contact_flags, wbc_state, period,
    )

    kp_arm = jnp.asarray(wbc_cfg.arm_joint_kp, dtype=data.M.dtype)
    kd_arm = jnp.asarray(wbc_cfg.arm_joint_kd, dtype=data.M.dtype)
    if arm_locked:
        ee_rows = T.arm_joint_tracking_task(data, kp_arm, kd_arm)
    else:
        ee_rows = T.concat_tasks(
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
        )
    task1_full = T.concat_tasks(
        T.base_height_motion_task(data, wbc_cfg.base_height_kp, wbc_cfg.base_height_kd),
        T.base_angular_motion_task(data, wbc_cfg.base_angular_kp, wbc_cfg.base_angular_kd),
        ee_rows,
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
    return data, [task0, task1, task2]


def hierarchical_wbc(model: RobotModel, wbc_cfg, state_desired, input_desired,
                     rbd_measured, contact_flags, wbc_state: WbcState, period,
                     use_arm_init: bool | jnp.ndarray = False, qp_iters=None,
                     arm_locked: bool = False):
    """Combined-system WBC tick. ``use_arm_init``: time < arm_init_time.

    ``arm_locked`` (static; quad-only variant, BASELINE config #1): the EE
    tracking rows of T1 are replaced by the arm-joint PD hold — same 6 rows,
    so the hierarchy keeps its fixed shape — while base height/angular and
    swing tasks stay in place (holding the WHOLE T1 on the arm-init stack
    forever measured a trot that settles ~10 deg tilted: it drops the base
    orientation task).

    Returns (cmd (54,), new_wbc_state).
    """
    qp_iters = wbc_cfg.qp_iterations if qp_iters is None else qp_iters
    data, tasks = combined_tasks(
        model, wbc_cfg, state_desired, input_desired, rbd_measured,
        contact_flags, wbc_state, period, use_arm_init=use_arm_init,
        arm_locked=arm_locked,
    )
    x_opt = solve_hierarchy(tasks, qp_iters=qp_iters)
    tau = T.compute_torque(data, x_opt)
    cmd = jnp.concatenate([x_opt, tau])
    return cmd, WbcState(input_last=input_desired)


def hierarchical_wbc_batched(model: RobotModel, wbc_cfg, state_desired,
                             input_desired, rbd_measured, contact_flags,
                             wbc_state: WbcState, period,
                             use_arm_init: bool | jnp.ndarray = False,
                             qp_iters=None, arm_locked: bool = False,
                             backend: str | None = None):
    """Batch-major combined-system WBC tick: every per-robot argument
    (state_desired (B,30), input_desired (B,nu), rbd_measured (B,55),
    contact_flags (B,4), wbc_state.input_last (B,nu)) carries a leading
    batch axis. Task formulation is vmapped (elementwise-heavy, fuses well);
    the QP cascade runs batch-major through the Pallas SPD kernel on TPU —
    the vmapped cascade left 90+ batched XLA cho_factor calls on the 500 Hz
    tick's critical path (docs/PERF.md, WBC table).

    Returns (cmd (B,54), new_wbc_state).
    """
    import jax

    if backend is None:
        backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    qp_iters = wbc_cfg.qp_iterations if qp_iters is None else qp_iters

    def build(x_d, u_d, rbd, flags, il):
        return combined_tasks(
            model, wbc_cfg, x_d, u_d, rbd, flags, WbcState(input_last=il),
            period, use_arm_init=use_arm_init, arm_locked=arm_locked,
        )

    data, tasks = jax.vmap(build)(
        state_desired, input_desired, rbd_measured, contact_flags,
        wbc_state.input_last,
    )
    x_opt = solve_hierarchy_batched(tasks, qp_iters=qp_iters, backend=backend)
    tau = jax.vmap(T.compute_torque)(data, x_opt)
    cmd = jnp.concatenate([x_opt, tau], axis=-1)
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
