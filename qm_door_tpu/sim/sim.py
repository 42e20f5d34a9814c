"""Batched rigid-body simulation (Gazebo's role, qm_gazebo replacement).

Full whole-body dynamics M(q) a = tau_gen + J_c^T F_contact - h(q, v) with
spring-damper ground contacts and Coulomb-clamped tangential friction,
semi-implicit Euler at the physics rate. Actuator model reproduces
QMHWSim::writeSim (QMHWSim.cpp:98-116): a command delay ring buffer
(default.yaml gazebo/delay: 9 ms) followed by tau = kp (q_d - q) +
kd (v_d - v) + ff, clamped to URDF effort limits.

Pure JAX, vmappable over a scenario batch (terrain height offsets, payload,
pushes enter via SimConfig / external wrench inputs).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import struct

from ..models import centroidal, dynamics, kinematics
from ..models.model import RobotModel


class SimConfig(NamedTuple):
    dt: float = 0.001
    contact_stiffness: float = 40000.0
    # explicit-integration stability: c * dt / m_foot_effective < 1
    contact_damping: float = 500.0
    friction_coefficient: float = 0.8
    tangential_velocity_damping: float = 200.0
    # OPTIONAL stiction anchor spring (round 5, default OFF): pure
    # velocity-damping friction lets stance feet CREEP at v_t = F_t / c —
    # ~0.2 m/s under trot tangential loads — which is unphysical for rubber
    # on ground and breaks leg-odometry's stance-foot-stationary assumption
    # (the KF read the creep as +-0.24 m/s of phantom base velocity,
    # scratch/r5 kf_err series; the estimator-side fix is
    # KfParams.sensor_velocity). When > 0, each foot in contact anchors a
    # lateral spring at its touchdown point, with the anchor dragged along
    # the Coulomb circle when the clamp saturates. Statically validated
    # (tests/test_aux.py stiction test: an 80 N shove held without creep),
    # but NOT the default: the whole control stack's closed-loop behavior
    # was tuned against the creep plant, and under trot the elastic
    # tangential loads (~40 N sustained per stance foot, measured
    # scratch/r5/stiction_probe.py) destabilize the tuned loop. Re-tuning
    # the stack against the stiction plant is recorded future work
    # (docs/ROADMAP.md round 5).
    tangential_stiffness: float = 0.0
    delay_steps: int = 9  # 9 ms at 1 kHz (qm_gazebo/config/default.yaml:2)
    # terrain: static name selects the height-field; params are traced
    terrain: str = "flat"
    terrain_params: tuple = (0.0,)
    # lateral-collision world mesh (sim/world.py: mazes/tunnels/v-chimney);
    # "none" disables the wall-contact query entirely
    world: str = "none"
    world_offset: tuple = (0.0, 0.0, 0.0)
    wall_stiffness: float = 20000.0
    wall_damping: float = 300.0
    wall_friction: float = 0.7  # mazes/maze1.xacro:20-21

    @property
    def terrain_height(self):
        """Mean flat height (spawn grounding); exact only for flat terrain."""
        return self.terrain_params[0] if self.terrain == "flat" else 0.0


@struct.dataclass
class SimState:
    q: jnp.ndarray            # (24,)
    v: jnp.ndarray            # (24,)
    t: jnp.ndarray            # ()
    cmd_buffer: jnp.ndarray   # (delay_steps+1, 5, 18) hybrid command history
    buf_head: jnp.ndarray     # () int32 ring index
    anchor: jnp.ndarray       # (4,2) stiction anchor xy per foot (world)


def sim_init(model: RobotModel, q0, v0=None, cfg: SimConfig = SimConfig()) -> SimState:
    dtype = q0.dtype
    v0 = jnp.zeros(24, dtype=dtype) if v0 is None else v0
    nbuf = cfg.delay_steps + 1
    buf = jnp.zeros((nbuf, 5, 18), dtype=dtype)
    # initialize buffer with "hold position, zero gains" commands
    buf = buf.at[:, 0, :].set(q0[6:24])
    return SimState(
        q=q0, v=v0, t=jnp.zeros((), dtype=dtype), cmd_buffer=buf,
        buf_head=jnp.zeros((), dtype=jnp.int32),
        anchor=kinematics.contact_positions(model, q0)[:, 0:2],
    )


def _contact_forces(model: RobotModel, cfg: SimConfig, q, v, anchor=None):
    """(4,3) ground-reaction forces on the feet (world frame).

    ``anchor`` (4,2): stiction anchor points (see SimConfig.
    tangential_stiffness). Returns (F, J, in_contact, anchor_new)."""
    from .terrain import terrain_height

    p = kinematics.contact_positions(model, q)                   # (4,3)
    J = kinematics.frame_jacobians(model, q, model.contact_frame_ids)[:, :3, :]
    vel = J @ v                                                   # (4,3)
    ground = terrain_height(cfg.terrain, p[:, 0], p[:, 1], cfg.terrain_params)
    depth = ground - p[:, 2]                                      # >0 when penetrating
    in_contact = depth > 0
    fz = jnp.where(
        in_contact, cfg.contact_stiffness * depth - cfg.contact_damping * vel[:, 2], 0.0
    )
    fz = jnp.maximum(fz, 0.0)
    k_t = cfg.tangential_stiffness
    if anchor is None or k_t == 0.0:
        ft = -cfg.tangential_velocity_damping * vel[:, :2] * in_contact[:, None]
        anchor_new = p[:, 0:2]
    else:
        # Swing feet carry their anchor along (touchdown re-anchors there)
        # — but only CLEARLY airborne feet (2 mm clearance): standing feet
        # micro-hop through depth = 0 at the contact-spring frequency, and
        # resetting the anchor on every hop ratchets it along at the creep
        # rate, silently degrading the spring back to velocity damping
        # (measured: 5 cm/s drift under a 25 N sustained shove, i.e. WORSE
        # than the creep model it replaces).
        airborne = depth < -0.002
        anchor_eff = jnp.where(airborne[:, None], p[:, 0:2], anchor)
        ft = (-k_t * (p[:, 0:2] - anchor_eff)
              - cfg.tangential_velocity_damping * vel[:, :2]) * in_contact[:, None]
        anchor_new = anchor_eff
    # Coulomb clamp
    ft_norm = jnp.linalg.norm(ft, axis=-1, keepdims=True)
    ft_max = cfg.friction_coefficient * fz[:, None]
    scale = jnp.where(ft_norm > ft_max, ft_max / jnp.maximum(ft_norm, 1e-9), 1.0)
    ft = ft * scale
    if anchor is not None and k_t != 0.0:
        # saturated clamp = kinetic sliding: drag the anchor so the spring
        # alone would produce exactly the clamped force (keeps the spring
        # state on the Coulomb circle instead of winding up)
        slide = scale < 1.0
        anchor_slid = p[:, 0:2] + (
            ft + cfg.tangential_velocity_damping * vel[:, :2]) / k_t
        anchor_new = jnp.where(slide & in_contact[:, None],
                               anchor_slid, anchor_new)
    return jnp.concatenate([ft, fz[:, None]], axis=-1), J, in_contact, anchor_new


def push_command(state: SimState, command_stack) -> SimState:
    """Insert a new hybrid command (5,18) into the delay ring buffer."""
    nbuf = state.cmd_buffer.shape[0]
    head = (state.buf_head + 1) % nbuf
    buf = state.cmd_buffer.at[head].set(command_stack)
    return state.replace(cmd_buffer=buf, buf_head=head)


def _delayed_command(state: SimState):
    """Oldest command in the ring = the one delayed by delay_steps."""
    nbuf = state.cmd_buffer.shape[0]
    idx = (state.buf_head + 1) % nbuf
    return state.cmd_buffer[idx]


@partial(jax.jit, static_argnames=("cfg",))
def sim_step(model: RobotModel, cfg: SimConfig, state: SimState, command_stack,
             external_wrench=None, tau_gen_extra=None) -> SimState:
    """One physics step. ``command_stack`` is (5,18): rows
    (pos_des, vel_des, kp, kd, tau_ff). ``external_wrench`` (6,) optional
    disturbance on the base (world frame force/torque at base origin);
    ``tau_gen_extra`` (24,) optional generalized force (e.g. J_ee^T F from
    the door grasp coupling, sim/door.py)."""
    state = push_command(state, command_stack)
    cmd = _delayed_command(state)

    q, v = state.q, state.v
    q_j, v_j = q[6:24], v[6:24]
    tau = cmd[2] * (cmd[0] - q_j) + cmd[3] * (cmd[1] - v_j) + cmd[4]
    tau = jnp.clip(tau, -model.effort_limit, model.effort_limit)

    Fc, J, _, anchor_new = _contact_forces(model, cfg, q, v, state.anchor)
    tau_gen = jnp.concatenate([jnp.zeros(6, dtype=q.dtype), tau])
    tau_gen = tau_gen + jnp.einsum("cij,ci->j", J, Fc)
    if cfg.world != "none":
        from .world import load_world, world_generalized_forces

        mesh = load_world(cfg.world, cfg.world_offset)
        tau_gen = tau_gen + world_generalized_forces(
            model, mesh, q, v, stiffness=cfg.wall_stiffness,
            damping=cfg.wall_damping, mu=cfg.wall_friction,
        )
    if external_wrench is not None:
        Jb = kinematics.frame_jacobians(model, q, (model.base_frame_id,))[0]
        tau_gen = tau_gen + Jb.T @ external_wrench
    if tau_gen_extra is not None:
        tau_gen = tau_gen + tau_gen_extra

    a = dynamics.forward_dynamics(model, q, v, tau_gen)
    v_new = v + cfg.dt * a
    q_new = q + cfg.dt * v_new
    return state.replace(q=q_new, v=v_new, t=state.t + cfg.dt,
                         anchor=anchor_new)


@partial(jax.jit, static_argnames=("threshold", "cfg"))
def contact_flags_from_sim(model: RobotModel, q, threshold=0.002, cfg=None):
    """Ground-truth contact flags from foot height above the *terrain*
    (ContactSensor stand-in). Pass ``cfg`` on non-flat worlds — thresholding
    absolute z would never register stance on a raised step/stair."""
    from .terrain import terrain_height

    p = kinematics.contact_positions(model, q)
    if cfg is None:
        ground = 0.0
    else:
        ground = terrain_height(cfg.terrain, p[:, 0], p[:, 1], cfg.terrain_params)
    return (p[:, 2] - ground < threshold).astype(q.dtype)


def measured_rbd(model: RobotModel, state: SimState):
    """Ground-truth estimator output (FromTopicStateEstimate equivalent)."""
    return centroidal.rbd_from_generalized(model, state.q, state.v)
