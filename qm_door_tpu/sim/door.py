"""Articulated door model for the door-opening scenario (pure JAX).

World-library parity for qm_description/urdf/doors/door_{push,pull}.urdf:
a door panel on a vertical hinge (frame-door joint: damping 0.2, travel
[-2, 0] rad, door_push.urdf:66-69) with a lever handle (door-lever joint:
travel [-0.5236, 0], :99-102). The reference opens these doors in Gazebo on
its force-tracking branch; here the door is a one-DoF (panel) + one-DoF
(lever) second-order system coupled to the robot's end-effector through a
stiff grasp spring, so batched door-opening rollouts stay jittable.

Sign convention: panel angle 0 = closed, negative = opening (push door).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
from flax import struct

from ..models import kinematics, spatial
from ..models.model import RobotModel


class DoorConfig(NamedTuple):
    hinge_pos: tuple = (0.0, 0.0)        # world (x, y) of the hinge axis
    hinge_yaw: float = 0.0               # door frame heading at angle 0
    # Tuned lumped parameter, NOT URDF-derived: door_push.urdf's inertial
    # tags (panel 0.1 kg, lever 5 kg, frame 100 kg) are placeholder values
    # that Gazebo's constraint solver masks; this inertia gives a realistic
    # interior door (~25 kg slab, 0.9 m wide: m w^2 / 3 ~ 7-9 kg m^2).
    panel_inertia: float = 8.53          # kg m^2 about the hinge
    panel_damping: float = 0.2           # door_push.urdf:66
    panel_lower: float = -2.0            # door_push.urdf:69
    panel_upper: float = 0.0
    lever_inertia: float = 0.01
    lever_damping: float = 0.05
    lever_spring: float = 2.0            # returns the handle to 0
    lever_lower: float = -0.5236         # door_push.urdf:102
    lever_upper: float = 0.0
    # Handle point in the door frame (x along the panel); magnitude matches
    # the URDF lever placement (|x| = 0.796 there, opposite sign convention
    # since our x axis points hinge -> handle), height tuned for the robot.
    handle_offset: tuple = (0.8, -0.05, 1.0)
    grasp_stiffness: float = 2000.0      # EE-handle coupling spring
    grasp_damping: float = 50.0
    latch_release: float = -0.4          # lever angle that frees the panel
    # Panel slab geometry for robot-body contact (door_push.urdf panel
    # collision box: 0.9 x 0.04 x 2.0 roughly; the handle sits at |x|=0.8):
    panel_width: float = 0.9             # hinge -> free edge extent (m)
    panel_height: float = 2.0
    panel_thickness: float = 0.05
    contact_stiffness: float = 20000.0   # matches sim/world.py wall params
    contact_damping: float = 300.0
    contact_mu: float = 0.7


@struct.dataclass
class DoorState:
    angle: jnp.ndarray        # () panel hinge angle
    rate: jnp.ndarray
    lever: jnp.ndarray        # () handle lever angle
    lever_rate: jnp.ndarray

    @staticmethod
    def init(dtype=jnp.float32):
        z = jnp.zeros((), dtype=dtype)
        return DoorState(angle=z, rate=z, lever=z, lever_rate=z)


def handle_position(cfg: DoorConfig, state: DoorState, dtype=None):
    """World position of the handle point for the current panel angle."""
    dtype = dtype or state.angle.dtype
    yaw = cfg.hinge_yaw + state.angle
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    ox, oy, oz = cfg.handle_offset
    hx = cfg.hinge_pos[0] + c * ox - s * oy
    hy = cfg.hinge_pos[1] + s * ox + c * oy
    return jnp.stack([hx, hy, jnp.asarray(oz, dtype=dtype)])


def handle_velocity(cfg: DoorConfig, state: DoorState):
    """World velocity of the handle point (panel rotation only)."""
    yaw = cfg.hinge_yaw + state.angle
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    ox, oy, _ = cfg.handle_offset
    # d/dt of the rotated offset
    vx = (-s * ox - c * oy) * state.rate
    vy = (c * ox - s * oy) * state.rate
    return jnp.stack([vx, vy, jnp.zeros_like(vx)])


def grasp_wrench(model: RobotModel, cfg: DoorConfig, state: DoorState, q, v):
    """Force the grasp spring applies ON the robot EE (world frame, 3).

    Equal and opposite force acts on the door at the handle point.
    """
    R_ee, p_ee = kinematics.ee_pose(model, q)
    J_ee = kinematics.frame_jacobians(model, q, (model.ee_frame_id,))[0]
    v_ee = spatial.fmv(J_ee[:3], v)
    p_h = handle_position(cfg, state, q.dtype)
    v_h = handle_velocity(cfg, state)
    F_on_ee = -cfg.grasp_stiffness * (p_ee - p_h) - cfg.grasp_damping * (v_ee - v_h)
    return F_on_ee, p_ee, J_ee


def panel_contact_forces(model: RobotModel, cfg: DoorConfig, state: DoorState,
                         q, v):
    """Penalty contact of the robot BODY against the door panel slab.

    The grasp spring couples only the EE to the handle; this adds what
    Gazebo's collision pipeline gives the reference (QMHWSim.cpp:71-96 reads
    ContactManager over the URDF collision boxes, door_push.urdf:63-107):
    trunk proxy spheres and feet vs the panel treated as a vertical slab of
    ``panel_thickness`` spanning [0, panel_width] x [0, panel_height] in the
    door frame at the current hinge angle. Same spring-damper +
    Coulomb-clamped tangential model as sim/world.py:sphere_mesh_force.

    Returns (tau_gen (24,) on the robot, tau_hinge () reaction torque on the
    panel about the hinge axis).
    """
    from .world import FOOT_RADIUS, TRUNK_POINTS, TRUNK_RADIUS

    dtype = q.dtype
    yaw = cfg.hinge_yaw + state.angle
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    u = jnp.stack([c, s, jnp.zeros_like(c)])          # hinge -> free edge
    n = jnp.stack([-s, c, jnp.zeros_like(c)])         # panel normal
    hinge = jnp.asarray([cfg.hinge_pos[0], cfg.hinge_pos[1], 0.0], dtype=dtype)
    half_t = 0.5 * cfg.panel_thickness

    def sphere_force(p, v_p, radius):
        rel = p - hinge
        d = jnp.dot(rel, n)                           # signed normal distance
        span = jnp.dot(rel, u)                        # along-panel coordinate
        inside = ((span >= 0.0) & (span <= cfg.panel_width)
                  & (p[2] >= 0.0) & (p[2] <= cfg.panel_height))
        pen = radius + half_t - jnp.abs(d)
        engaged = inside & (pen > 0.0)
        n_dir = jnp.sign(d) * n                       # toward the sphere side
        # panel surface point velocity: hinge rotation at rate about z
        v_panel = state.rate * jnp.stack([-rel[1], rel[0], jnp.zeros_like(d)])
        v_rel = v_p - v_panel
        vn = jnp.dot(v_rel, n_dir)
        fn = jnp.maximum(
            jnp.where(engaged, cfg.contact_stiffness * pen
                      - cfg.contact_damping * vn, 0.0), 0.0)
        v_t = v_rel - vn * n_dir
        ft = -200.0 * v_t * engaged
        ft_norm = jnp.linalg.norm(ft)
        ft_max = cfg.contact_mu * fn
        ft = ft * jnp.where(ft_norm > ft_max,
                            ft_max / jnp.maximum(ft_norm, 1e-9), 1.0)
        return fn * n_dir + ft

    tau = jnp.zeros(24, dtype=dtype)
    tau_hinge = jnp.zeros((), dtype=dtype)

    p_feet = kinematics.contact_positions(model, q)
    J_feet = kinematics.frame_jacobians(model, q, model.contact_frame_ids)[:, :3, :]
    R_base = spatial.zyx_to_rot(q[3:6])
    axes_origins = kinematics.joint_world_axes(model, q)[:2]

    points = [(p_feet[i], J_feet[i], FOOT_RADIUS) for i in range(4)]
    for r_local in TRUNK_POINTS:
        p_w = q[0:3] + spatial.fmv(R_base, jnp.asarray(r_local, dtype))
        J = kinematics.point_jacobian(model, q, 0, p_w, axes_origins)[:3]
        points.append((p_w, J, TRUNK_RADIUS))

    for p_w, J, radius in points:
        v_w = J @ v
        F = sphere_force(p_w, v_w, radius)
        tau = tau + J.T @ F
        r = p_w - hinge
        tau_hinge = tau_hinge + (r[0] * (-F[1]) - r[1] * (-F[0]))
    return tau, tau_hinge


def door_step(cfg: DoorConfig, state: DoorState, F_on_door, p_applied, dt,
              latched=True, tau_hinge_extra=0.0):
    """Advance the door one step under a world force at a point on the panel.

    F_on_door (3,): force the robot applies to the door (minus the grasp
    force on the EE). ``latched``: when True the panel only moves if the
    lever is pulled past ``latch_release`` (door_push latch behavior); the
    lever itself is driven by the z-component of the applied force acting at
    the handle lever arm (0.1 m).
    """
    dtype = state.angle.dtype
    yaw = cfg.hinge_yaw + state.angle
    # torque about the vertical hinge: (p - hinge) x F, z row
    rx = p_applied[0] - cfg.hinge_pos[0]
    ry = p_applied[1] - cfg.hinge_pos[1]
    tau_panel = rx * F_on_door[1] - ry * F_on_door[0] + tau_hinge_extra

    # lever: -z force on the handle turns it (0.1 m lever arm), spring return
    tau_lever = 0.1 * F_on_door[2] - cfg.lever_spring * state.lever \
        - cfg.lever_damping * state.lever_rate
    lever_acc = tau_lever / cfg.lever_inertia
    lever_rate = state.lever_rate + dt * lever_acc
    lever = jnp.clip(state.lever + dt * lever_rate, cfg.lever_lower, cfg.lever_upper)
    # zero only the limit-violating velocity direction
    lever_rate = jnp.where(
        ((lever <= cfg.lever_lower) & (lever_rate < 0))
        | ((lever >= cfg.lever_upper) & (lever_rate > 0)),
        jnp.zeros_like(lever_rate), lever_rate,
    )

    unlatched = jnp.logical_or(
        jnp.logical_not(jnp.asarray(latched)),
        jnp.logical_or(lever < cfg.latch_release, state.angle < -1e-3),
    )
    acc = jnp.where(
        unlatched,
        (tau_panel - cfg.panel_damping * state.rate) / cfg.panel_inertia,
        jnp.zeros_like(tau_panel),
    )
    rate = jnp.where(unlatched, state.rate + dt * acc, jnp.zeros_like(state.rate))
    angle = jnp.clip(state.angle + dt * rate, cfg.panel_lower, cfg.panel_upper)
    rate = jnp.where(
        ((angle <= cfg.panel_lower) & (rate < 0))
        | ((angle >= cfg.panel_upper) & (rate > 0)),
        jnp.zeros_like(rate), rate,
    )
    return DoorState(angle=angle, rate=rate, lever=lever, lever_rate=lever_rate)


def coupled_step(model: RobotModel, sim_cfg, door_cfg: DoorConfig,
                 sim_state, door_state: DoorState, command_stack,
                 latched=True, grasp_on=1.0, body_contact=True):
    """One physics step of robot + door with the grasp coupling active.

    Returns (sim_state, door_state). The grasp spring force acts on the
    robot EE (via J_ee^T) and, with opposite sign, on the door at the EE
    application point. ``grasp_on`` in [0, 1] gates the coupling (0 before
    the hand closes on the handle). ``body_contact`` adds trunk/feet vs
    panel-slab penalty contact (Gazebo collision parity — a closed panel
    stops a walking robot; the grasp spring alone cannot represent that).
    """
    from .sim import sim_step

    F_on_ee, p_ee, J_ee = grasp_wrench(
        model, door_cfg, door_state, sim_state.q, sim_state.v
    )
    F_on_ee = jnp.asarray(grasp_on, dtype=F_on_ee.dtype) * F_on_ee
    tau_extra = J_ee[:3].T @ F_on_ee
    tau_hinge_extra = 0.0
    if body_contact:
        tau_body, tau_hinge_extra = panel_contact_forces(
            model, door_cfg, door_state, sim_state.q, sim_state.v
        )
        tau_extra = tau_extra + tau_body
    sim_new = sim_step(
        model, sim_cfg, sim_state, command_stack, tau_gen_extra=tau_extra
    )
    door_new = door_step(
        door_cfg, door_state, -F_on_ee, p_ee, sim_cfg.dt, latched=latched,
        tau_hinge_extra=tau_hinge_extra,
    )
    return sim_new, door_new
