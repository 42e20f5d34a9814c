"""Force-aware hierarchical WBC: decision vars widen 36 -> 42 with the EE
wrench (config #4; the reference's force-tracking branch extends WbcBase the
same way — the wrench task slot mirrors the contact-force task pattern of
qm_wbc/src/WbcBase.cpp:566-578).

x (42) = [qddot (24); F_feet (12); W_ee (6)], with W_ee the external wrench
ON the robot at the EE frame (rows of arm_J order [linear; angular]):

    M qdd + h = J_c^T F + J_ee^T W + S^T tau

Tasks that ignore the wrench are the 36-var formulations padded with 6 zero
columns; the EoM / torque-limit / torque-recovery pieces gain the J_ee^T W
terms; a wrench-tracking equality (W = W_mpc while grasping, W = 0 when not)
is placed by ``wrench_priority``: level 0 (default) pins it alongside the
EoM — W is an external force the world applies, not a decision variable the
optimizer may spend — while level 2 keeps the legacy slot next to the
contact-force task for A/B (see :func:`hierarchical_wbc_ft`).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..models.model import RobotModel
from . import tasks as T
from .hoqp import Task, solve_hierarchy, solve_hierarchy_batched
from .wbc import WbcState

N_DEC_FT = 42
NQ = 24


def pad_cols(t: Task) -> Task:
    """Lift a 36-var task into the 42-var space (wrench columns zero)."""
    dtype = t.A.dtype
    A = jnp.concatenate([t.A, jnp.zeros((t.A.shape[0], 6), dtype=dtype)], axis=1)
    D = jnp.concatenate([t.D, jnp.zeros((t.D.shape[0], 6), dtype=dtype)], axis=1)
    return Task(A, t.b, D, t.f)


def floating_base_eom_task_ft(d: T.WbcData) -> Task:
    """[M_b, -J_c^T_b, -J_ee^T_b] x = -h_b."""
    A = jnp.concatenate(
        [d.M[:6, :], -d.Jc.T[:6, :], -d.arm_J.T[:6, :]], axis=1
    )
    b = -d.nle[:6]
    De = jnp.zeros((0, N_DEC_FT), dtype=A.dtype)
    return Task(A, b, De, jnp.zeros((0,), dtype=A.dtype))


def torque_limits_task_ft(d: T.WbcData) -> Task:
    """|M_j qdd - J_c^T_j F - J_ee^T_j W + h_j| <= tau_lim."""
    dtype = d.M.dtype
    row = jnp.concatenate(
        [d.M[6:, :], -d.Jc.T[6:, :], -d.arm_J.T[6:, :]], axis=1
    )
    D = jnp.concatenate([row, -row], axis=0)
    f = jnp.concatenate([d.torque_limits - d.nle[6:], d.torque_limits + d.nle[6:]])
    return Task(jnp.zeros((0, N_DEC_FT), dtype=dtype), jnp.zeros((0,), dtype=dtype), D, f)


def wrench_tracking_task(d: T.WbcData, grasp) -> Task:
    """W = grasp * W_mpc (zero wrench when not grasping)."""
    dtype = d.M.dtype
    A = jnp.concatenate(
        [jnp.zeros((6, 36), dtype=dtype), jnp.eye(6, dtype=dtype)], axis=1
    )
    b = jnp.asarray(grasp, dtype=dtype) * d.wrench_des
    De = jnp.zeros((0, N_DEC_FT), dtype=dtype)
    return Task(A, b, De, jnp.zeros((0,), dtype=dtype))


def compute_torque_ft(d: T.WbcData, x_opt):
    """tau = M_j qdd + h_j - J_c^T_j F - J_ee^T_j W."""
    qdd = x_opt[:NQ]
    F = x_opt[NQ:NQ + 12]
    W = x_opt[NQ + 12:NQ + 18]
    return (d.M[6:, :] @ qdd + d.nle[6:]
            - d.Jc.T[6:, :] @ F - d.arm_J.T[6:, :] @ W)


def hierarchical_wbc_ft(model: RobotModel, wbc_cfg, state_desired,
                        input_desired, rbd_measured, contact_flags, grasp,
                        wbc_state: WbcState, period, qp_iters=None,
                        wrench_priority: int = 0):
    """Force-tracking combined-system WBC tick.

    input_desired (36); grasp: scalar gate for the wrench tracking.
    Returns (cmd (60,) = [qdd; F; W; tau], new_wbc_state).

    ``wrench_priority`` (static): hierarchy level of the wrench-tracking
    equality W = grasp * W_mpc.

    - 0 (default): the wrench is pinned at the TOP level, alongside the EoM.
      W is an *external* force the world applies — it is not a degree of
      freedom the optimizer may spend. With the wrench at a lower level the
      EoM/motion levels satisfy themselves with a phantom wrench the
      environment never delivers (measured on the door demo: press/push MPC
      violations 1e-1 with the phantom wrench vs 1e-10 pinned, and roughly
      half the commanded drive actually transmitted to the panel).
    - 2: legacy slot next to the contact-force task (the pattern of
      qm_wbc/src/WbcBase.cpp:566-578 where foot-force tracking lives), kept
      for A/B because the pinned variant changes the closed-loop dynamics
      the door scenario constants were originally tuned against.
    """
    if wrench_priority not in (0, 2):
        raise ValueError(
            f"wrench_priority must be 0 (pinned with the EoM) or 2 (legacy "
            f"contact-force slot), got {wrench_priority!r}")
    qp_iters = wbc_cfg.qp_iterations if qp_iters is None else qp_iters
    data, tasks = ft_tasks(
        model, wbc_cfg, state_desired, input_desired, rbd_measured,
        contact_flags, grasp, wbc_state, period,
        wrench_priority=wrench_priority,
    )
    x_opt = solve_hierarchy(tasks, qp_iters=qp_iters)
    tau = compute_torque_ft(data, x_opt)
    cmd = jnp.concatenate([x_opt, tau])
    return cmd, WbcState(input_last=input_desired)


def ft_tasks(model: RobotModel, wbc_cfg, state_desired, input_desired,
             rbd_measured, contact_flags, grasp, wbc_state: WbcState, period,
             wrench_priority: int = 0):
    """Pure force-tracking task formulation (no QP solve): returns
    (data, [T0, T1, T2]) so batched callers can vmap it and hand the stacked
    tasks to :func:`..hoqp.solve_hierarchy_batched` (the same split
    wbc.combined_tasks provides for the nominal 36-var stack)."""
    data = T.build_wbc_data(
        model, state_desired, input_desired, rbd_measured, contact_flags,
        wbc_state.input_last, period,
    )
    dtype = data.M.dtype

    task0_parts = [
        floating_base_eom_task_ft(data),
        torque_limits_task_ft(data),
        pad_cols(T.no_contact_motion_task(data)),
        pad_cols(T.friction_cone_task(data, wbc_cfg.friction_coefficient)),
    ]
    if wrench_priority == 0:
        task0_parts.append(wrench_tracking_task(data, grasp))
    task0 = T.concat_tasks(*task0_parts)
    task1 = T.concat_tasks(
        pad_cols(T.base_height_motion_task(data, wbc_cfg.base_height_kp, wbc_cfg.base_height_kd)),
        pad_cols(T.base_angular_motion_task(data, wbc_cfg.base_angular_kp, wbc_cfg.base_angular_kd)),
        pad_cols(T.ee_linear_tracking_task(
            data,
            jnp.asarray(wbc_cfg.ee_linear_kp, dtype=dtype),
            jnp.asarray(wbc_cfg.ee_linear_kd, dtype=dtype),
        )),
        pad_cols(T.ee_angular_tracking_task(
            data,
            jnp.asarray(wbc_cfg.ee_angular_kp, dtype=dtype),
            jnp.asarray(wbc_cfg.ee_angular_kd, dtype=dtype),
        )),
        T.scale_task(
            pad_cols(T.swing_leg_task(data, wbc_cfg.swing_kp, wbc_cfg.swing_kd)),
            wbc_cfg.swing_task_weight,
        ),
    )
    task2_parts = [pad_cols(T.contact_force_task(data))]
    if wrench_priority != 0:
        task2_parts.append(wrench_tracking_task(data, grasp))
    task2_parts.append(
        pad_cols(T.base_linear_motion_task(data, wbc_cfg.base_linear_kp, wbc_cfg.base_linear_kd)))
    task2 = T.concat_tasks(*task2_parts)
    return data, [task0, task1, task2]


def hierarchical_wbc_ft_batched(model: RobotModel, wbc_cfg, state_desired,
                                input_desired, rbd_measured, contact_flags,
                                grasp, wbc_state: WbcState, period,
                                qp_iters=None, wrench_priority: int = 0,
                                backend: str | None = None):
    """Batch-major force-tracking WBC tick: per-robot arguments carry a
    leading batch axis (state (B,30), input (B,36), rbd (B,55), flags (B,4),
    grasp (B,), input_last (B,36)). Task formulation is vmapped; the 42-var
    cascade runs batch-major through the slack-condensed PDIP on the Pallas
    SPD kernel — the vmapped route left 90+ batched XLA cho_factor calls per
    tick on the door scenario's critical path (docs/PERF.md, WBC table ft
    row). Returns (cmd (B,60), new_wbc_state)."""
    import jax

    if backend is None:
        backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    qp_iters = wbc_cfg.qp_iterations if qp_iters is None else qp_iters

    def build(x_d, u_d, rbd, flags, g, il):
        return ft_tasks(
            model, wbc_cfg, x_d, u_d, rbd, flags, g,
            WbcState(input_last=il), period, wrench_priority=wrench_priority,
        )

    data, tasks = jax.vmap(build)(
        state_desired, input_desired, rbd_measured, contact_flags, grasp,
        wbc_state.input_last,
    )
    x_opt = solve_hierarchy_batched(tasks, qp_iters=qp_iters, backend=backend)
    tau = jax.vmap(compute_torque_ft)(data, x_opt)
    cmd = jnp.concatenate([x_opt, tau], axis=-1)
    return cmd, WbcState(input_last=input_desired)
