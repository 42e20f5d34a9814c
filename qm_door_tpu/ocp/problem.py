"""OCP definition: per-node stage data, cost evaluation and quadratization.

Replaces the cost/soft-constraint assembly of qm_interface
(QMInterface::setupOptimalControlProblem + LeggedRobotQuadraticTrackingCost +
EndEffectorConstraint-as-soft-constraint + friction-cone relaxed barrier +
arm joint/velocity soft box limits).

The quadratization is closed-form (constant Q/R, Gauss-Newton for the EE
penalty exactly as OCS2 does for Linear-order soft constraints, analytic
barrier second derivatives for cone/box terms) — no autodiff Hessians in the
hot path.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..models import centroidal, kinematics, spatial
from ..models.model import RobotModel
from . import penalties
from .gait import GaitSchedule
from .reference import TargetTrajectories
from .swing import SwingConfig, compile_swing_references


@struct.dataclass
class OcpConfig:
    """Static numeric config of the OCP (arrays precomputed at build time)."""

    Q: jnp.ndarray            # (30,30)
    R: jnp.ndarray            # (30,30) with the base->feet Jacobian mapping
    ee_mu_position: float = struct.field(pytree_node=False)
    ee_mu_orientation: float = struct.field(pytree_node=False)
    final_ee_mu_position: float = struct.field(pytree_node=False)
    final_ee_mu_orientation: float = struct.field(pytree_node=False)
    friction_coefficient: float = struct.field(pytree_node=False)
    cone_mu: float = struct.field(pytree_node=False)
    cone_delta: float = struct.field(pytree_node=False)
    cone_regularization: float = struct.field(pytree_node=False)
    limit_pos_mu: float = struct.field(pytree_node=False)
    limit_pos_delta: float = struct.field(pytree_node=False)
    limit_vel_mu: float = struct.field(pytree_node=False)
    limit_vel_delta: float = struct.field(pytree_node=False)
    arm_pos_lower: jnp.ndarray  # (6,)
    arm_pos_upper: jnp.ndarray
    arm_vel_lower: jnp.ndarray
    arm_vel_upper: jnp.ndarray
    # force-tracking only (ocp/force.py): soft box on the EE wrench input
    wrench_lower: jnp.ndarray = None  # (6,)
    wrench_upper: jnp.ndarray = None
    wrench_mu: float = struct.field(pytree_node=False, default=0.1)
    wrench_delta: float = struct.field(pytree_node=False, default=1e-3)
    # quad-only variant (BASELINE config #1): arm velocity inputs pinned to
    # zero in the projection, EE tracking cost off (reference
    # ModelSettings.h:147-153 leg-only joint set, realized as a mask — the
    # framework's fixed-shape mode-switching rule)
    arm_locked: bool = struct.field(pytree_node=False, default=False)
    # self-collision soft constraint (ocp/collision.py); mu = 0 disables,
    # matching the reference's declared-but-uninstantiated constraint
    self_collision_mu: float = struct.field(pytree_node=False, default=0.0)
    self_collision_delta: float = struct.field(pytree_node=False, default=0.02)
    self_collision_margin: float = struct.field(pytree_node=False, default=0.05)


def make_ocp_config(model: RobotModel, cfg, dtype=jnp.float64) -> OcpConfig:
    """Build OcpConfig from a QmConfig, including the R leg-velocity mapping
    (QMInterface::initializeInputCostWeight, QMInterface.cpp:274-299)."""
    from ..config import SelfCollisionSettings

    c = cfg.cost
    sc = getattr(cfg, "self_collision", None) or SelfCollisionSettings()
    Q = jnp.asarray(np.diag(c.q_diag), dtype=dtype)

    r_task = np.concatenate(
        [np.full(12, c.r_forces), np.full(12, c.r_foot_velocity), np.full(6, c.r_arm_velocity)]
    ) * c.r_scaling
    R_task = np.diag(r_task)

    # base->feet Jacobian at the nominal (initial) configuration: rows = foot
    # linear Jacobian leg-joint columns (12x12).
    x0 = jnp.asarray(cfg.initial_state(), dtype=dtype)
    q0 = centroidal.pinocchio_q(x0)
    J = kinematics.frame_jacobians(model, q0, model.contact_frame_ids)  # (4,6,24)
    base2feet = np.asarray(J[:, :3, 6:18]).reshape(12, 12)
    R = R_task.copy()
    R[12:24, 12:24] = base2feet.T @ R_task[12:24, 12:24] @ base2feet

    jl = cfg.joint_limits
    return OcpConfig(
        Q=Q,
        R=jnp.asarray(R, dtype=dtype),
        ee_mu_position=c.ee_mu_position,
        ee_mu_orientation=c.ee_mu_orientation,
        final_ee_mu_position=c.final_ee_mu_position,
        final_ee_mu_orientation=c.final_ee_mu_orientation,
        friction_coefficient=cfg.friction.friction_coefficient,
        cone_mu=cfg.friction.barrier_mu,
        cone_delta=cfg.friction.barrier_delta,
        cone_regularization=cfg.friction.cone_regularization,
        limit_pos_mu=jl.position_mu,
        limit_pos_delta=jl.position_delta,
        limit_vel_mu=jl.velocity_mu,
        limit_vel_delta=jl.velocity_delta,
        arm_pos_lower=jnp.asarray(model.pos_lower[12:18], dtype=dtype),
        arm_pos_upper=jnp.asarray(model.pos_upper[12:18], dtype=dtype),
        arm_vel_lower=jnp.asarray(jl.arm_velocity_lower, dtype=dtype),
        arm_vel_upper=jnp.asarray(jl.arm_velocity_upper, dtype=dtype),
        arm_locked=getattr(cfg.model, "arm_locked", False),
        self_collision_mu=sc.mu,
        self_collision_delta=sc.delta,
        self_collision_margin=sc.margin,
    )


@struct.dataclass
class StageData:
    """Per-solve reference arrays over the N+1 node grid (all fixed-shape).

    The two trailing fields exist only on the force-tracking problem
    (u_nom widens to 36 there; see ocp/force.py): ``grasp_flags`` gates the
    EE-wrench input like contact_flags gate foot forces, and the wrench
    reference lives in u_nom[..., 30:36].
    """

    times: jnp.ndarray          # (N+1,)
    contact_flags: jnp.ndarray  # (N+1, 4)
    x_nom: jnp.ndarray          # (N+1, 30) desired state (tracking cost)
    u_nom: jnp.ndarray          # (N+1, nu) weight-compensating input
    ee_pos_ref: jnp.ndarray     # (N+1, 3)
    ee_quat_ref: jnp.ndarray    # (N+1, 4) xyzw
    z_vel_ref: jnp.ndarray      # (N+1, 4) swing normal-velocity reference
    z_pos_ref: jnp.ndarray      # (N+1, 4)
    grasp_flags: jnp.ndarray = None   # (N+1,) 1 = EE wrench active (ft only)


def build_stage_data(
    model: RobotModel,
    cfg,
    schedule: GaitSchedule,
    targets: TargetTrajectories,
    t0: float,
    horizon: Optional[float] = None,
    dt: Optional[float] = None,
    dtype=jnp.float64,
    phase_heights=None,
) -> StageData:
    """Compile gait + targets into the solver's per-node arrays.

    Host-side timeline sampling (numpy; gaits are host state) + jitted-friendly
    target interpolation. This is the 'preSolverRun' of the reference
    (SwitchedModelReferenceManager + SwingTrajectoryPlanner + cost desired
    trajectories) compiled into data.
    """
    horizon = cfg.mpc.time_horizon if horizon is None else horizon
    dt = cfg.sqp.dt if dt is None else dt
    timeline = schedule.compile_timeline(t0, horizon, dt)
    sw = cfg.swing
    swing_cfg = SwingConfig(
        lift_off_velocity=sw.lift_off_velocity,
        touch_down_velocity=sw.touch_down_velocity,
        swing_height=sw.swing_height,
        touchdown_after_horizon=sw.touchdown_after_horizon,
        swing_time_scale=sw.swing_time_scale,
    )
    z_pos, z_vel = compile_swing_references(
        schedule, timeline.times, swing_cfg, phase_heights=phase_heights
    )

    times = jnp.asarray(timeline.times, dtype=dtype)
    flags = jnp.asarray(timeline.contact_flags, dtype=dtype)

    desired = jax.vmap(targets.desired_state)(times)  # (N+1, 37)
    ee_pos, ee_quat = jax.vmap(targets.ee_pose)(times)
    u_nom = jax.vmap(lambda f: centroidal.weight_compensating_input(model, f, dtype=dtype))(flags)

    return StageData(
        times=times,
        contact_flags=flags,
        x_nom=desired[:, :30],
        u_nom=u_nom,
        ee_pos_ref=ee_pos,
        ee_quat_ref=ee_quat,
        z_vel_ref=jnp.asarray(z_vel, dtype=dtype),
        z_pos_ref=jnp.asarray(z_pos, dtype=dtype),
    )


# ---------------------------------------------------------------------------
# cost evaluation
# ---------------------------------------------------------------------------

def _ee_error(model: RobotModel, ocp: OcpConfig, x, ee_pos_ref, ee_quat_ref):
    """6-dim EE pose error [position; ocs2 quaternion error]
    (EndEffectorConstraint::getValue)."""
    q = centroidal.pinocchio_q(x)
    R, p = kinematics.ee_pose(model, q)
    quat = spatial.rot_to_quat(R)
    return jnp.concatenate(
        [p - ee_pos_ref, spatial.quat_error_ocs2(quat, ee_quat_ref)]
    )


def _cone_h(ocp: OcpConfig, F):
    """Friction-cone margin h = mu Fz - sqrt(Fx^2 + Fy^2 + reg) per foot (4,)."""
    s = jnp.sqrt(F[..., 0] ** 2 + F[..., 1] ** 2 + ocp.cone_regularization)
    return ocp.friction_coefficient * F[..., 2] - s


def _tracking_cost(ocp: OcpConfig, dx, du):
    return 0.5 * dx @ (ocp.Q @ dx) + 0.5 * du @ (ocp.R @ du)


def _soft_limits_cost(ocp: OcpConfig, x, u):
    arm_q = x[24:30]
    arm_v = u[24:30]
    pos = penalties.box_barrier(
        arm_q, ocp.arm_pos_lower, ocp.arm_pos_upper, ocp.limit_pos_mu, ocp.limit_pos_delta
    )
    vel = penalties.box_barrier(
        arm_v, ocp.arm_vel_lower, ocp.arm_vel_upper, ocp.limit_vel_mu, ocp.limit_vel_delta
    )
    c = jnp.sum(pos) + jnp.sum(vel)
    if u.shape[-1] == 36 and ocp.wrench_lower is not None:
        c = c + jnp.sum(penalties.box_barrier(
            u[30:36], ocp.wrench_lower, ocp.wrench_upper,
            ocp.wrench_mu, ocp.wrench_delta
        ))
    return c


def _cone_cost(ocp: OcpConfig, u, contact_flags):
    F = centroidal.contact_forces(u)
    h = _cone_h(ocp, F)
    p = penalties.relaxed_barrier(h, ocp.cone_mu, ocp.cone_delta)
    return jnp.sum(contact_flags * p)


def ee_stage_cost(model, ocp: OcpConfig, x, ee_pos_ref, ee_quat_ref, final=False):
    e = _ee_error(model, ocp, x, ee_pos_ref, ee_quat_ref)
    mu_p = ocp.final_ee_mu_position if final else ocp.ee_mu_position
    mu_o = ocp.final_ee_mu_orientation if final else ocp.ee_mu_orientation
    w = jnp.concatenate([jnp.full(3, mu_p), jnp.full(3, mu_o)])
    return 0.5 * jnp.sum(w * e * e)


def stage_cost(model: RobotModel, ocp: OcpConfig, stage: StageData, k, x, u):
    """Scalar stage cost L(t_k, x, u) (un-scaled by dt)."""
    dx = x - stage.x_nom[k]
    du = u - stage.u_nom[k]
    c = _tracking_cost(ocp, dx, du)
    c += ee_stage_cost(model, ocp, x, stage.ee_pos_ref[k], stage.ee_quat_ref[k])
    c += _cone_cost(ocp, u, stage.contact_flags[k])
    c += _soft_limits_cost(ocp, x, u)
    if ocp.self_collision_mu > 0.0:
        from . import collision

        c += collision.self_collision_cost(model, ocp, x)
    return c


def terminal_cost(model: RobotModel, ocp: OcpConfig, stage: StageData, x):
    """Final-node cost: EE pose penalty only (QMInterface adds no terminal Q)."""
    return ee_stage_cost(
        model, ocp, x, stage.ee_pos_ref[-1], stage.ee_quat_ref[-1], final=True
    )


# ---------------------------------------------------------------------------
# closed-form quadratization
# ---------------------------------------------------------------------------

def _cone_derivs(ocp: OcpConfig, F):
    """Per-foot cone h gradient (4,3) and Hessian (4,3,3) w.r.t. F."""
    fx, fy = F[..., 0], F[..., 1]
    s = jnp.sqrt(fx * fx + fy * fy + ocp.cone_regularization)
    mu_c = ocp.friction_coefficient
    dh = jnp.stack([-fx / s, -fy / s, jnp.full_like(fx, mu_c)], axis=-1)
    s3 = s * s * s
    hxx = -(s * s - fx * fx) / s3
    hyy = -(s * s - fy * fy) / s3
    hxy = fx * fy / s3
    zero = jnp.zeros_like(fx)
    H = jnp.stack(
        [
            jnp.stack([hxx, hxy, zero], axis=-1),
            jnp.stack([hxy, hyy, zero], axis=-1),
            jnp.stack([zero, zero, zero], axis=-1),
        ],
        axis=-2,
    )
    return dh, H


def quadratize_stage(model: RobotModel, ocp: OcpConfig, stage: StageData, k, x, u,
                     ee_lin=None):
    """(l, lx, lu, lxx, luu, lux) of the stage cost at (x, u).

    Exact for the quadratic tracking term and the barrier terms (analytic
    second derivatives, matching OCS2's Quadratic-order FrictionConeConstraint
    and SoftBoxConstraint); Gauss-Newton for the EE penalty (OCS2 Linear-order
    soft constraint behavior). ``ee_lin``: optional precomputed (e, Je) from a
    fused linearization pipeline.
    """
    dtype = x.dtype
    nu = u.shape[-1]  # 30 nominal, 36 force-tracking (EE wrench appended)
    dx = x - stage.x_nom[k]
    du = u - stage.u_nom[k]

    l = _tracking_cost(ocp, dx, du)
    lx = ocp.Q @ dx
    lu = ocp.R @ du
    lxx = ocp.Q
    luu = ocp.R
    lux = jnp.zeros((nu, 30), dtype=dtype)

    # EE penalty (Gauss-Newton on the 6-dim error)
    if ee_lin is None:
        err_fn = partial(
            _ee_error, model, ocp, ee_pos_ref=stage.ee_pos_ref[k], ee_quat_ref=stage.ee_quat_ref[k]
        )
        e = err_fn(x)
        Je = jax.jacfwd(err_fn)(x)  # (6,30)
    else:
        e, Je = ee_lin
    w = jnp.concatenate(
        [jnp.full(3, ocp.ee_mu_position, dtype=dtype), jnp.full(3, ocp.ee_mu_orientation, dtype=dtype)]
    )
    l = l + 0.5 * jnp.sum(w * e * e)
    lx = lx + spatial.fmv(Je.T, w * e)
    lxx = lxx + spatial.fmm(Je.T, w[:, None] * Je)

    # friction cone barrier (exact)
    flags = stage.contact_flags[k]
    F = centroidal.contact_forces(u)
    h = _cone_h(ocp, F)
    p = penalties.relaxed_barrier(h, ocp.cone_mu, ocp.cone_delta)
    dp = penalties.relaxed_barrier_d(h, ocp.cone_mu, ocp.cone_delta)
    ddp = penalties.relaxed_barrier_dd(h, ocp.cone_mu, ocp.cone_delta)
    dh, Hh = _cone_derivs(ocp, F)
    l = l + jnp.sum(flags * p)
    gF = flags[:, None] * dp[:, None] * dh  # (4,3)
    HF = flags[:, None, None] * (
        ddp[:, None, None] * dh[:, :, None] * dh[:, None, :] + dp[:, None, None] * Hh
    )  # (4,3,3)
    lu = lu.at[0:12].add(gF.reshape(12))
    luu = luu + jax.scipy.linalg.block_diag(
        *[HF[i] for i in range(4)], jnp.zeros((nu - 12, nu - 12), dtype=dtype)
    )

    # soft box limits (exact, diagonal)
    arm_q = x[24:30]
    arm_v = u[24:30]
    l = l + _soft_limits_cost(ocp, x, u)
    lx = lx.at[24:30].add(
        penalties.box_barrier_d(arm_q, ocp.arm_pos_lower, ocp.arm_pos_upper, ocp.limit_pos_mu, ocp.limit_pos_delta)
    )
    lu = lu.at[24:30].add(
        penalties.box_barrier_d(arm_v, ocp.arm_vel_lower, ocp.arm_vel_upper, ocp.limit_vel_mu, ocp.limit_vel_delta)
    )
    dxx = penalties.box_barrier_dd(arm_q, ocp.arm_pos_lower, ocp.arm_pos_upper, ocp.limit_pos_mu, ocp.limit_pos_delta)
    duu = penalties.box_barrier_dd(arm_v, ocp.arm_vel_lower, ocp.arm_vel_upper, ocp.limit_vel_mu, ocp.limit_vel_delta)
    lxx = lxx + jnp.diag(jnp.concatenate([jnp.zeros(24, dtype=dtype), dxx]))
    luu = luu + jnp.diag(jnp.concatenate(
        [jnp.zeros(24, dtype=dtype), duu, jnp.zeros(nu - 30, dtype=dtype)]
    ))

    # EE wrench soft box (force-tracking only; value term is inside
    # _soft_limits_cost already)
    if nu == 36 and ocp.wrench_lower is not None:
        w = u[30:36]
        lu = lu.at[30:36].add(penalties.box_barrier_d(
            w, ocp.wrench_lower, ocp.wrench_upper, ocp.wrench_mu, ocp.wrench_delta
        ))
        dww = penalties.box_barrier_dd(
            w, ocp.wrench_lower, ocp.wrench_upper, ocp.wrench_mu, ocp.wrench_delta
        )
        luu = luu + jnp.diag(jnp.concatenate([jnp.zeros(30, dtype=dtype), dww]))

    if ocp.self_collision_mu > 0.0:
        from . import collision

        lc, lcx, lcxx = collision.quadratize_self_collision(model, ocp, x)
        l = l + lc
        lx = lx + lcx
        lxx = lxx + lcxx

    return l, lx, lu, lxx, luu, lux


def quadratize_terminal(model: RobotModel, ocp: OcpConfig, stage: StageData, x):
    """(l, lx, lxx) of the terminal EE cost (Gauss-Newton)."""
    dtype = x.dtype
    err_fn = partial(
        _ee_error, model, ocp, ee_pos_ref=stage.ee_pos_ref[-1], ee_quat_ref=stage.ee_quat_ref[-1]
    )
    e = err_fn(x)
    Je = jax.jacfwd(err_fn)(x)
    w = jnp.concatenate(
        [
            jnp.full(3, ocp.final_ee_mu_position, dtype=dtype),
            jnp.full(3, ocp.final_ee_mu_orientation, dtype=dtype),
        ]
    )
    l = 0.5 * jnp.sum(w * e * e)
    lx = spatial.fmv(Je.T, w * e)
    lxx = spatial.fmm(Je.T, w[:, None] * Je)
    return l, lx, lxx
