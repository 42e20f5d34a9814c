"""Door-opening closed loop: force-tracking NMPC + force-aware WBC + the
articulated door (BASELINE config #4; the reference demonstrates this on its
force-tracking branch in the push/pull-door Gazebo worlds,
qm_gazebo/launch/cs/{push,pull}_door.launch).

Scenario phases (host-side reference generation, re-planned every MPC cycle
from the *measured* door state — the reaching/levering/pushing equivalent of
the reference's target-publisher pipeline):

  1. reach  [0, t_reach):  EE pose target on the handle, no grasp, zero wrench.
  2. press  [t_reach, ...): grasp engaged (sim spring coupling on); wrench
     reference presses the lever down until the latch releases.
  3. push   (after latch release): wrench reference switches to a
     panel-normal push that swings the door open; the EE target follows the
     moving handle along its arc.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

from ..config import QmConfig
from ..models import centroidal, kinematics, spatial
from ..models.model import RobotModel
from ..ocp.force import make_ocp_config_ft, widen_stage_data
from ..ocp.gait import GaitSchedule
from ..ocp.problem import build_stage_data
from ..ocp.reference import TargetTrajectories
from ..runtime.controller import QmController
from ..runtime.mrt import PolicyStore
from ..solver.sqp import SqpSolver
from ..wbc.wbc import WbcState
from .door import DoorConfig, DoorState, coupled_step, handle_position
from .sim import SimConfig, measured_rbd, sim_init


class DoorScenario(NamedTuple):
    t_reach: float = 0.5        # settle + reach the handle
    t_unlatch_min: float = 0.3  # press at least this long before pushing
    # EE z-target depth below the handle while pressing the lever
    # (2000 N/m grasp spring: 15 mm ~ 30 N down, lever arm 0.1 m ~ 3 N m
    # against the 2 N m/rad return spring)
    press_depth: float = 0.015
    open_target: float = -0.5   # rad panel angle considered "open"
    # Door motion is POSITION-driven (EE reference leads along the handle
    # arc; the grasp spring transmits the force) and the wrench reference is
    # the MEASURED grasp force — see _wrench_world. At the open target the
    # EE target freezes on the open_target handle point so the spring brakes
    # the coasting panel; once the panel has stopped the grasp is RELEASED
    # with the EE target frozen at the handle (a release while still pushing
    # is a measured-divergent disturbance; at near-zero stretch it is
    # benign, and the swung-open handle sits outside the fixed-base arm
    # workspace — holding it forever drags the robot over).
    door_rate_ref: float = -0.5  # rad/s arc-lead rate of the EE reference
    release_rate: float = 0.12   # |panel rate| below which the hand lets go
    # the swinging handle leaves the sagittal workspace; the base tracks it
    # by yawing with the panel (stance feet stay planted — the MPC leans)
    base_yaw_gain: float = 0.6   # base yaw ref per rad of panel angle
    base_shift_gain: float = 0.2 # base xy ref per m of handle displacement


@dataclass
class DoorLog:
    t: List[float] = field(default_factory=list)
    panel: List[float] = field(default_factory=list)
    lever: List[float] = field(default_factory=list)
    base_pose: List[np.ndarray] = field(default_factory=list)
    ee_pos: List[np.ndarray] = field(default_factory=list)
    ee_err: List[float] = field(default_factory=list)
    wrench_plan: List[np.ndarray] = field(default_factory=list)
    mpc_viol: List[float] = field(default_factory=list)
    mpc_t: List[float] = field(default_factory=list)
    mpc_phase: List[str] = field(default_factory=list)
    safe: bool = True


class DoorOpeningRunner:
    """Closed-loop door opening with the full force-tracking stack."""

    def __init__(
        self,
        model: RobotModel,
        cfg: QmConfig,
        door_cfg: Optional[DoorConfig] = None,
        scenario: DoorScenario = DoorScenario(),
        sim_cfg: SimConfig = SimConfig(),
        control_decimation: int = 2,
        mpc_decimation: int = 10,
    ):
        self.model = model
        self.cfg = cfg
        self.scenario = scenario
        self.sim_cfg = sim_cfg
        self.ocp = make_ocp_config_ft(model, cfg)
        self.solver = SqpSolver(model, self.ocp, cfg)
        self.controller = QmController(model, cfg, force_tracking=True)
        self.control_decimation = control_decimation
        self.mpc_decimation = mpc_decimation
        self.schedule = GaitSchedule()  # stance throughout

        # Place the door so the handle sits a hand-width ahead of the spawn
        # EE pose (unless the caller provides a door explicitly).
        x0 = jnp.asarray(cfg.initial_state())
        _, p_ee = kinematics.ee_pose(model, x0[6:30])
        if door_cfg is None:
            handle_target = np.asarray(p_ee) + np.array([0.06, 0.0, 0.0])
            base = DoorConfig()
            ox, oy, oz = base.handle_offset
            door_cfg = base._replace(
                hinge_pos=(float(handle_target[0] - ox), float(handle_target[1] - oy)),
                handle_offset=(ox, oy, float(handle_target[2])),
            )
        self.door_cfg = door_cfg

    # --- reference generation per MPC cycle -------------------------------

    def _phase(self, t, door: DoorState):
        sc = self.scenario
        # sticky: grip jitter can let the lever spring back above the latch
        # threshold for a moment; once the latch released, it stays released
        if (float(door.lever) < self.door_cfg.latch_release
                or float(door.angle) < -1e-3):
            self._unlatched = True
        if getattr(self, "_done", False):
            return "done"  # grasp released, door open, hold posture
        if getattr(self, "_braking", False) or float(door.angle) <= sc.open_target:
            self._braking = True  # open: stop pushing, brake
            if abs(float(door.rate)) <= sc.release_rate:
                self._done = True
                # freeze the EE target where the handle stopped
                self._p_release = np.asarray(
                    handle_position(self.door_cfg, door, jnp.float64))
                return "done"
            return "brake"
        if t < sc.t_reach:
            return "reach"
        if getattr(self, "_unlatched", False) and t >= sc.t_reach + sc.t_unlatch_min:
            return "push"
        return "press"

    def _wrench_world(self, phase, F_meas):
        """Reference wrench ON THE ROBOT = the MEASURED grasp force, smoothed.

        Admittance design, the fix for a measured tip-over mode: a
        feedforward wrench reference the spring does not actually deliver
        makes the MPC lean against a phantom force (it plans contact forces
        for a +25 N reaction while the real stretch force is near zero) and
        the robot rolls over before the door moves. With the reference tied
        to the measured interaction force the solver's internal model always
        matches reality; the door is DRIVEN by the EE position reference
        marching along the handle arc, and the force follows the stretch.
        """
        w = np.zeros(6)
        if phase in ("press", "push", "brake"):
            alpha = 0.5
            self._w_ref = (1 - alpha) * self._w_ref + alpha * np.asarray(F_meas)
            w[0:3] = self._w_ref
        else:
            self._w_ref = np.zeros(3)
        return w

    def _targets(self, phase, door: DoorState, ee_quat_hold, t=0.0):
        """EE target on the handle. During the push the target PREDICTS the
        handle's arc over the MPC horizon (a static current-handle target
        makes the arm lag the moving handle by a full reaction time —
        measured as a growing grasp-spring stretch); through the braking
        hold it keeps following the handle (the hand never lets go). The
        base holds its spawn pose."""
        sc = self.scenario
        if phase == "push":
            # Predict the panel angle with a blend of the measured rate and
            # the arc-lead setpoint (so the target leads a static door),
            # saturated at the open target where the brake takes over.
            dts = np.linspace(0.0, 1.2, 8)
            rate_pred = 0.5 * (float(door.rate) + sc.door_rate_ref)
            angles = np.clip(
                float(door.angle) + rate_pred * dts,
                sc.open_target, 0.0,
            )
        elif phase == "brake":
            # freeze the EE target on the open-target handle point: the
            # grasp spring decelerates the coasting panel
            dts = np.array([0.0, 1e5])
            angles = np.full(2, sc.open_target)
        else:
            dts = np.array([0.0, 1e5])
            angles = np.full(2, float(door.angle))
        x_base = np.asarray(self._x_nom)
        states = []
        for a in angles:
            d = door.replace(angle=jnp.asarray(a, dtype=jnp.float64))
            if phase == "done":
                p_t = self._p_release
            else:
                p_t = np.asarray(handle_position(self.door_cfg, d, jnp.float64))
                if phase == "press":
                    # press the lever by targeting below the handle
                    p_t = p_t - np.array([0.0, 0.0, sc.press_depth])
            x = x_base.copy()
            if phase in ("push", "brake", "done"):
                # the base follows the panel — yaw with the door and lean a
                # fraction of the handle displacement so the handle stays
                # inside the arm workspace (stance feet remain planted)
                x[6:8] += sc.base_shift_gain * (p_t[0:2] - self._handle0[0:2])
                x[9] = sc.base_yaw_gain * a
            states.append(jnp.concatenate([
                jnp.asarray(x), jnp.asarray(p_t), ee_quat_hold
            ]))
        return TargetTrajectories.create(
            jnp.asarray(t + dts), jnp.stack(states),
            jnp.zeros((len(angles), 30)),
        )

    # --- main loop --------------------------------------------------------

    def run(self, duration: float = 3.0) -> DoorLog:
        model, cfg, sc = self.model, self.cfg, self.scenario
        x_init = jnp.asarray(cfg.initial_state())
        q0 = centroidal.pinocchio_q(x_init)
        feet_z = float(jnp.mean(kinematics.contact_positions(model, q0)[:, 2]))
        q0 = q0.at[2].add(self.sim_cfg.terrain_height - feet_z)
        self._x_nom = x_init.at[8].set(float(q0[2]))
        sim = sim_init(model, q0, cfg=self.sim_cfg)
        door = DoorState.init(dtype=jnp.float64)

        R_ee0, p_ee0 = kinematics.ee_pose(model, q0)
        ee_quat_hold = spatial.rot_to_quat(R_ee0)
        self._ee_home = np.asarray(p_ee0)
        self._braking = False
        self._done = False
        self._unlatched = False
        self._handle0 = np.asarray(
            handle_position(self.door_cfg, door, jnp.float64))

        rbd_est = measured_rbd(model, sim)
        x_obs = centroidal.centroidal_state_from_rbd(model, rbd_est)
        self._w_ref = np.zeros(3)

        def make_stage(t, phase, sim, door):
            from .door import grasp_wrench

            targets = self._targets(phase, door, ee_quat_hold, t)
            stage = build_stage_data(model, cfg, self.schedule, targets, t)
            grasp_now = 0.0 if phase in ("reach", "done") else 1.0
            F_meas = grasp_now * np.asarray(
                grasp_wrench(model, self.door_cfg, door, sim.q, sim.v)[0])
            w = self._wrench_world(phase, F_meas)
            n_nodes = stage.times.shape[0]
            return widen_stage_data(
                stage,
                np.full(n_nodes, grasp_now),
                np.tile(w, (n_nodes, 1)),
            )

        phase = self._phase(0.0, door)
        stage = make_stage(0.0, phase, sim, door)
        sol = self.solver.solve(stage, x_obs)
        sol = self.solver.solve(stage, x_obs, warm=(sol.times, sol.X, sol.U))
        policy = PolicyStore(times=sol.times, X=sol.X, U=sol.U)

        wbc_state = WbcState.init(dtype=x_init.dtype, nu=36)
        log = DoorLog()
        command = None
        n_steps = int(round(duration / self.sim_cfg.dt))
        dt = self.sim_cfg.dt
        ctrl_period = dt * self.control_decimation

        for step in range(n_steps):
            t = step * dt
            phase = self._phase(t, door)
            grasp_now = 0.0 if phase in ("reach", "done") else 1.0

            if step % self.mpc_decimation == 0 and step > 0:
                x_obs = centroidal.centroidal_state_from_rbd(model, rbd_est)
                stage = make_stage(t, phase, sim, door)
                sol = self.solver.solve(stage, x_obs, warm=(sol.times, sol.X, sol.U))
                policy = PolicyStore(times=sol.times, X=sol.X, U=sol.U)
                log.mpc_viol.append(float(sol.constraint_violation))
                log.mpc_t.append(t)
                log.mpc_phase.append(phase)

            if step % self.control_decimation == 0 or command is None:
                flags = jnp.asarray(
                    self.schedule.contact_flags_at(t), dtype=x_init.dtype
                )
                res = self.controller.tick(
                    policy, flags, rbd_est, wbc_state, t, ctrl_period,
                    grasp=grasp_now,
                )
                wbc_state = res.wbc_state
                command = jnp.stack([
                    res.command.pos_des, res.command.vel_des,
                    res.command.kp, res.command.kd, res.command.tau_ff,
                ])
                if not bool(res.safe):
                    log.safe = False
                    break
                p_h = np.asarray(handle_position(self.door_cfg, door, jnp.float64))
                log.t.append(t)
                log.panel.append(float(door.angle))
                log.lever.append(float(door.lever))
                log.base_pose.append(np.asarray(sim.q[0:6]))
                log.ee_pos.append(np.asarray(rbd_est[48:51]))
                log.ee_err.append(float(np.linalg.norm(np.asarray(rbd_est[48:51]) - p_h)))
                log.wrench_plan.append(np.asarray(res.u_opt[30:36]))

            sim, door = coupled_step(
                model, self.sim_cfg, self.door_cfg, sim, door, command,
                latched=True, grasp_on=grasp_now,
            )
            rbd_est = measured_rbd(model, sim)

        return log
