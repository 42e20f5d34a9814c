"""Controller runtime: the QMController::update tick as pure functions + a
host-side orchestrator (replaces ros_control plugin lifecycle,
qm_controllers/src/QMController.cpp:129-201).

One control tick:
  rbd state -> centroidal observation (yaw-unwrapped)
  -> evaluate MPC policy at t (MRT)
  -> hierarchical WBC -> torques
  -> safety check
  -> hybrid-joint commands (posDes, velDes, kp, kd, tau_ff per joint)

The MPC solve itself runs at its own cadence (100 Hz) around this tick; see
sim/closed_loop.py for the interleaving used in simulation.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import struct

from ..models import centroidal
from ..models.model import RobotModel
from ..wbc.wbc import WbcState, hierarchical_wbc, hierarchical_mpc_wbc
from .mrt import PolicyStore, evaluate_policy
from .safety import safety_check


class ControllerConfig(NamedTuple):
    """Static control-law parameters (QMController::updateControlLaw)."""

    leg_kp: float = 0.0
    leg_kd: float = 3.0
    arm_kp: float = 0.0
    arm_kd: float = 0.5
    leg_pd_start_time: float = 10.0
    arm_init_time: float = 10.0


@struct.dataclass
class HybridCommand:
    """The 5-tuple motor command per joint (HybridJointInterface.h:10-91)."""

    pos_des: jnp.ndarray  # (18,)
    vel_des: jnp.ndarray  # (18,)
    kp: jnp.ndarray       # (18,)
    kd: jnp.ndarray       # (18,)
    tau_ff: jnp.ndarray   # (18,)

    def torque(self, q_meas, v_meas):
        """The actuator-side law tau = kp (q_d - q) + kd (v_d - v) + ff
        (QMHWSim::writeSim, QMHWSim.cpp:98-116)."""
        return (
            self.kp * (self.pos_des - q_meas)
            + self.kd * (self.vel_des - v_meas)
            + self.tau_ff
        )


@struct.dataclass
class TickResult:
    command: HybridCommand
    x_obs: jnp.ndarray          # (30,) centroidal observation
    x_opt: jnp.ndarray          # (30,) policy state
    u_opt: jnp.ndarray          # (30,) policy input
    wbc_cmd: jnp.ndarray        # (54,) [qdd; F; tau]
    safe: jnp.ndarray           # bool
    wbc_state: WbcState


def observe(model: RobotModel, rbd_measured, yaw_last):
    """rbdState -> yaw-unwrapped centroidal observation
    (QMController::updateStateEstimation, QMController.cpp:238-245)."""
    x = centroidal.centroidal_state_from_rbd(model, rbd_measured)
    yaw = x[9]
    dyaw = jnp.arctan2(jnp.sin(yaw - yaw_last), jnp.cos(yaw - yaw_last))
    return x.at[9].set(yaw_last + dyaw)


def controller_tick(
    model: RobotModel,
    wbc_cfg,
    ctrl: ControllerConfig,
    policy: PolicyStore,
    contact_flags,
    rbd_measured,
    wbc_state: WbcState,
    t,
    period,
    yaw_last,
    separated: bool = False,
    force_tracking: bool = False,
    grasp=0.0,
    arm_locked=False,
    wrench_priority: int = 0,
) -> TickResult:
    """One jittable control tick (QMController::update body).

    ``force_tracking``: policy inputs are 36-dim (EE wrench appended) and the
    WBC runs the 42-var force-aware hierarchy (wbc/force.py); ``grasp`` gates
    the wrench-tracking task.
    """
    x_obs = observe(model, rbd_measured, yaw_last)
    x_opt, u_opt = evaluate_policy(policy, t)

    if force_tracking:
        from ..wbc.force import hierarchical_wbc_ft

        wbc_cmd, wbc_state = hierarchical_wbc_ft(
            model, wbc_cfg, x_opt, u_opt, rbd_measured, contact_flags,
            grasp, wbc_state, period, wrench_priority=wrench_priority,
        )
        tau = wbc_cmd[42:60]
    else:
        wbc_fn = hierarchical_mpc_wbc if separated else partial(
            hierarchical_wbc, use_arm_init=t < ctrl.arm_init_time,
            arm_locked=arm_locked,
        )
        wbc_cmd, wbc_state = wbc_fn(
            model, wbc_cfg, x_opt, u_opt, rbd_measured, contact_flags, wbc_state, period
        )
        tau = wbc_cmd[36:54]

    pos_des = centroidal.joint_angles(x_opt)
    vel_des = centroidal.joint_velocities(u_opt)

    dtype = x_obs.dtype
    # Legs are only commanded after leg_pd_start_time (QMController.cpp:180:
    # "if (time > 10)"); the arm is always commanded.
    leg_on = jnp.asarray(t > ctrl.leg_pd_start_time, dtype=dtype)
    kp = jnp.concatenate(
        [leg_on * jnp.full(12, ctrl.leg_kp, dtype=dtype), jnp.full(6, ctrl.arm_kp, dtype=dtype)]
    )
    kd = jnp.concatenate(
        [leg_on * jnp.full(12, ctrl.leg_kd, dtype=dtype), jnp.full(6, ctrl.arm_kd, dtype=dtype)]
    )
    vel_cmd = jnp.concatenate([vel_des[:12], jnp.zeros(6, dtype=dtype)])
    tau_ff = jnp.concatenate([leg_on * tau[:12], tau[12:]])
    command = HybridCommand(pos_des=pos_des, vel_des=vel_cmd, kp=kp, kd=kd, tau_ff=tau_ff)

    return TickResult(
        command=command,
        x_obs=x_obs,
        x_opt=x_opt,
        u_opt=u_opt,
        wbc_cmd=wbc_cmd,
        safe=safety_check(x_obs),
        wbc_state=wbc_state,
    )


class QmController:
    """Host-side controller wrapper holding jitted tick functions.

    ``separated=False`` mirrors qm::QMController (combined system,
    HierarchicalWbc); ``separated=True`` mirrors qm::QMMpcController
    (12-joint hardware, HierarchicalMpcWbc, arm driven by position
    interpolation q_meas + v_des * dt at 100 Hz).
    """

    def __init__(self, model: RobotModel, cfg, separated: bool = False,
                 force_tracking: bool = False):
        self.model = model
        self.cfg = cfg
        self.separated = separated
        self.force_tracking = force_tracking
        self.ctrl = ControllerConfig(
            leg_kp=cfg.controller.leg_kp,
            leg_kd=cfg.controller.leg_kd,
            arm_kp=cfg.controller.arm_kp,
            arm_kd=cfg.controller.arm_kd,
            leg_pd_start_time=cfg.controller.leg_pd_start_time,
            arm_init_time=cfg.wbc.arm_init_time,
        )
        # WBC gains travel as a traced pytree argument, so live gain tuning
        # (dynamic_reconfigure parity) re-uses the compiled tick: assign a new
        # WbcGains to ``self.gains`` between ticks — no recompile.
        from ..wbc.wbc import WbcGains

        self.gains = WbcGains.from_settings(cfg.wbc)
        self._tick = jax.jit(
            partial(controller_tick, model, separated=separated,
                    force_tracking=force_tracking,
                    arm_locked=getattr(cfg.model, "arm_locked", False),
                    wrench_priority=cfg.force_tracking.wrench_priority)
        )
        self.yaw_last = 0.0

    def tick(self, policy, contact_flags, rbd_measured, wbc_state, t, period,
             grasp=0.0):
        res = self._tick(
            self.gains, self.ctrl, policy, contact_flags, rbd_measured, wbc_state,
            jnp.asarray(t), jnp.asarray(period), jnp.asarray(self.yaw_last),
            grasp=jnp.asarray(grasp),
        )
        self.yaw_last = float(res.x_obs[9])
        return res
