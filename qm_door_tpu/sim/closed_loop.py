"""Closed-loop orchestration: physics (1 kHz) + controller (500 Hz) + MPC
(100 Hz) — the cadence of the reference stack (Gazebo 1 kHz physics,
ros_control ~500 Hz update, mpcDesiredFrequency 100).

Host-side loop mirroring QMController::starting/update + the MPC thread; each
piece (sim step, controller tick, SQP solve) is a jitted device function. The
MPC runs synchronously at its cadence here (deterministic replay); the
real-time asynchronous variant simply swaps the policy whenever a solve
finishes.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional

import jax.numpy as jnp
import numpy as np

from ..config import QmConfig
from ..models import centroidal
from ..models.model import RobotModel
from ..ocp.gait import GaitSchedule
from ..ocp.problem import build_stage_data, make_ocp_config
from ..ocp.reference import TargetTrajectories
from ..runtime.controller import QmController
from ..runtime.mrt import PolicyStore
from ..solver.sqp import SqpSolver
from ..wbc.wbc import WbcState
from . import terrain
from .sim import SimConfig, measured_rbd, sim_init, sim_step


@dataclass
class ClosedLoopLog:
    t: List[float] = field(default_factory=list)
    base_pose: List[np.ndarray] = field(default_factory=list)
    x_obs: List[np.ndarray] = field(default_factory=list)
    tau: List[np.ndarray] = field(default_factory=list)
    ee_pos: List[np.ndarray] = field(default_factory=list)
    mpc_cost: List[float] = field(default_factory=list)
    mpc_viol: List[float] = field(default_factory=list)
    safe: bool = True


class ClosedLoopRunner:
    """Deterministic closed-loop rollout of the full stack."""

    def __init__(
        self,
        model: RobotModel,
        cfg: QmConfig,
        schedule: Optional[GaitSchedule] = None,
        sim_cfg: SimConfig = SimConfig(),
        control_decimation: int = 2,   # physics steps per control tick (500 Hz)
        mpc_decimation: int = 10,      # physics steps per MPC solve (100 Hz)
        solver: Optional[SqpSolver] = None,
        estimator: str = "ground_truth",  # or "kalman" (IMU + leg odometry KF)
        separated: bool = False,  # separated-system WBC (the reference's ss/ launch set)
        sensor_noise: Optional[dict] = None,
        noise_seed: int = 0,
        kf_params=None,  # estimation.KfParams override (kalman only)
    ):
        """``sensor_noise`` (kalman estimator only): Gaussian noise std-devs
        injected on the synthesized sensor readings each physics step —
        keys "gyro" (rad/s), "acc" (m/s^2), "zyx" (rad, the IMU attitude
        estimate), "enc_q" (rad), "enc_v" (rad/s); missing keys are 0.
        ``sensor_noise="default"`` uses consumer-IMU-grade magnitudes. This
        exercises the KF under its actual operating conditions (the ground
        truth estimator never sees noise by construction)."""
        self.model = model
        self.cfg = cfg
        self.sim_cfg = sim_cfg
        self.schedule = schedule or GaitSchedule()
        if solver is None:
            self.ocp = make_ocp_config(model, cfg)
            self.solver = SqpSolver(model, self.ocp, cfg)
        else:
            self.ocp = solver.ocp
            self.solver = solver
        self.controller = QmController(model, cfg, separated=separated)
        self.control_decimation = control_decimation
        self.mpc_decimation = mpc_decimation
        self.estimator = estimator
        if sensor_noise == "default":
            sensor_noise = {"gyro": 0.005, "acc": 0.1, "zyx": 0.002,
                            "enc_q": 5e-4, "enc_v": 0.01}
        self.sensor_noise = sensor_noise
        self.noise_seed = noise_seed
        self.kf_params = kf_params

    def _phase_heights(self, targets, feet_xy, t_now):
        """Terrain-aware per-phase swing heights for the SwingTrajectoryPlanner
        role (ocs2 per-foot liftOff/touchDown height sequences, task.info:24-31).

        Touchdown xy is predicted by advancing each foot's current xy with
        the commanded base velocity (finite-differenced from the target
        trajectory); heights are the terrain height-field there. Returns
        None on flat terrain (the default flat-ground references)."""
        if self.sim_cfg.terrain == "flat":
            return None
        d0 = np.asarray(targets.desired_state(jnp.asarray(t_now)))
        d1 = np.asarray(targets.desired_state(jnp.asarray(t_now + 0.1)))
        v_cmd = (d1[6:8] - d0[6:8]) / 0.1

        def heights(foot, t0, t1):
            h = []
            for te in (t0, t1):
                xy = feet_xy[foot] + v_cmd * max(0.0, te - t_now)
                h.append(float(terrain.terrain_height(
                    self.sim_cfg.terrain, jnp.asarray(xy[0]),
                    jnp.asarray(xy[1]), self.sim_cfg.terrain_params,
                )))
            return h[0], h[1]

        return heights

    def run(
        self,
        targets: TargetTrajectories,
        duration: float,
        x0: Optional[np.ndarray] = None,
        start_height_offset: float = 0.0,
        external_wrench_fn=None,
    ) -> ClosedLoopLog:
        """``external_wrench_fn``: optional ``t -> (6,) base wrench`` applied
        in the sim each physics step (disturbance-rejection studies)."""
        model, cfg = self.model, self.cfg
        x_init = jnp.asarray(cfg.initial_state()) if x0 is None else jnp.asarray(x0)
        q0 = centroidal.pinocchio_q(x_init)
        # Spawn with feet exactly on the terrain (Gazebo drops the robot; we
        # solve the drop analytically) plus any requested extra offset.
        from ..models import kinematics

        feet_z = float(jnp.mean(kinematics.contact_positions(model, q0)[:, 2]))
        q0 = q0.at[2].add(self.sim_cfg.terrain_height - feet_z + start_height_offset)
        sim = sim_init(model, q0, cfg=self.sim_cfg)

        # estimator (ground truth = FromTopicStateEstimate parity; kalman =
        # IMU + leg-odometry linear KF fed from synthesized IMU readings)
        kf = None
        if self.estimator == "kalman":
            from ..estimation import KalmanFilterEstimate
            from ..estimation.base import imu_from_state

            kf = (KalmanFilterEstimate(model) if self.kf_params is None
                  else KalmanFilterEstimate(model, self.kf_params))
            kf.reset(sim.q)
            self._imu_from_state = imu_from_state
            self._noise_rng = np.random.default_rng(self.noise_seed)
        v_prev = sim.v
        rbd_est = measured_rbd(model, sim)

        # initial solve (QMController::starting — spin until policy received)
        rbd = rbd_est
        x_obs = centroidal.centroidal_state_from_rbd(model, rbd)
        from ..models import kinematics as _kin

        def stage_at(t_now):
            feet_xy = np.asarray(
                _kin.contact_positions(model, sim.q))[:, 0:2]
            return build_stage_data(
                model, cfg, self.schedule, targets, t_now,
                phase_heights=self._phase_heights(targets, feet_xy, t_now),
            )

        stage = stage_at(0.0)
        sol = self.solver.solve(stage, x_obs)
        sol = self.solver.solve(stage, x_obs, warm=(sol.times, sol.X, sol.U))
        policy = PolicyStore(times=sol.times, X=sol.X, U=sol.U)

        wbc_state = WbcState.init(dtype=x_init.dtype)
        log = ClosedLoopLog()
        command = None

        n_steps = int(round(duration / self.sim_cfg.dt))
        dt = self.sim_cfg.dt
        ctrl_period = dt * self.control_decimation

        for step in range(n_steps):
            t = step * dt
            if step % self.mpc_decimation == 0 and step > 0:
                rbd = rbd_est
                x_obs = centroidal.centroidal_state_from_rbd(model, rbd)
                stage = stage_at(t)
                sol = self.solver.solve(
                    stage, x_obs, warm=(sol.times, sol.X, sol.U)
                )
                policy = PolicyStore(times=sol.times, X=sol.X, U=sol.U)
                log.mpc_cost.append(float(sol.cost))
                log.mpc_viol.append(float(sol.constraint_violation))

            if step % self.control_decimation == 0 or command is None:
                rbd = rbd_est
                flags = jnp.asarray(
                    self.schedule.contact_flags_at(t), dtype=x_init.dtype
                )
                res = self.controller.tick(
                    policy, flags, rbd, wbc_state, t, ctrl_period
                )
                wbc_state = res.wbc_state
                command = jnp.stack(
                    [
                        res.command.pos_des,
                        res.command.vel_des,
                        res.command.kp,
                        res.command.kd,
                        res.command.tau_ff,
                    ]
                )
                if not bool(res.safe):
                    log.safe = False
                    break
                log.t.append(t)
                log.base_pose.append(np.asarray(sim.q[0:6]))
                log.x_obs.append(np.asarray(res.x_obs))
                log.tau.append(np.asarray(res.command.tau_ff))
                log.ee_pos.append(np.asarray(rbd[48:51]))

            wrench = (None if external_wrench_fn is None
                      else jnp.asarray(external_wrench_fn(t)))
            sim = sim_step(model, self.sim_cfg, sim, command,
                           external_wrench=wrench)
            if kf is None:
                rbd_est = measured_rbd(model, sim)
            else:
                a_w = (sim.v[0:3] - v_prev[0:3]) / dt
                v_prev = sim.v
                zyx, omega_w, acc_body = self._imu_from_state(
                    model, sim.q, sim.v, a_w
                )
                enc_q, enc_v = sim.q[6:24], sim.v[6:24]
                if self.sensor_noise:
                    sn = self.sensor_noise
                    nrm = lambda k, n: self._noise_rng.normal(
                        size=n) * sn.get(k, 0.0)
                    zyx = zyx + nrm("zyx", 3)
                    omega_w = omega_w + nrm("gyro", 3)
                    acc_body = acc_body + nrm("acc", 3)
                    enc_q = enc_q + nrm("enc_q", 18)
                    enc_v = enc_v + nrm("enc_v", 18)
                # The estimator consumes the contact SENSOR, not the gait
                # plan (QMHWSim.cpp:71-88 ContactManager flags feeding
                # StateEstimateBase::updateContact). Feeding SCHEDULE flags
                # here was a latent round-1 bug the r5 trot endurance
                # smoked out: at every phase flip the "stance" foot is
                # still airborne for the touchdown lag (swing tracking +
                # 9 ms actuator delay), and trusting a moving foot as
                # ground-fixed pulses +-0.2 m/s of phantom base velocity
                # into the estimate — the closed loop on it walks off and
                # falls inside 2 s of trot even with NOISE-FREE sensors.
                from .sim import contact_flags_from_sim

                kf_flags = jnp.asarray(
                    contact_flags_from_sim(model, sim.q, cfg=self.sim_cfg),
                    dtype=x_init.dtype)
                # per-foot terrain height at the filter's own foot estimate
                # (the foot-height measurement row assumes z = h(x, y); a
                # flat-ground scalar would bias the base height on
                # stairs/slope/wave worlds)
                pf = kf.state.xe[6:18].reshape(4, 3)
                th = terrain.terrain_height(
                    self.sim_cfg.terrain, pf[:, 0], pf[:, 1],
                    self.sim_cfg.terrain_params,
                )
                rbd_est = kf.update(
                    zyx, omega_w, acc_body, enc_q, enc_v,
                    kf_flags, dt, terrain_height=th,
                )

        return log
