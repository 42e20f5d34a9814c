"""KF estimate error vs ground truth during open-loop-ish trot: run the
closed loop on GROUND TRUTH (stable) while a KF shadows the same sensor
stream; print estimate errors."""
import os, sys
sys.path.insert(0, "/root/repo")
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np, jax.numpy as jnp
from qm_door_tpu.config import default_config
from qm_door_tpu.models import aliengo_z1, kinematics, spatial, centroidal
from qm_door_tpu.ocp.gait import GAIT_LIBRARY, GaitSchedule
from qm_door_tpu.ocp.problem import build_stage_data, make_ocp_config
from qm_door_tpu.ocp.reference import TargetTrajectories
from qm_door_tpu.runtime.controller import QmController
from qm_door_tpu.runtime.mrt import PolicyStore
from qm_door_tpu.solver.sqp import SqpSolver
from qm_door_tpu.sim.sim import SimConfig, measured_rbd, sim_init, sim_step
from qm_door_tpu.wbc.wbc import WbcState
from qm_door_tpu.estimation import KalmanFilterEstimate
from qm_door_tpu.estimation.base import imu_from_state
from qm_door_tpu.sim import terrain

model = aliengo_z1()
cfg = default_config()
cfg.controller.leg_pd_start_time = -1.0
cfg.wbc.arm_init_time = -1.0
x0 = jnp.asarray(cfg.initial_state())
q0 = centroidal.pinocchio_q(x0)
feet_z = float(jnp.mean(kinematics.contact_positions(model, q0)[:, 2]))
q0 = q0.at[2].add(-feet_z)
sim = sim_init(model, q0)
sc = SimConfig()
R_ee, p_ee = kinematics.ee_pose(model, q0)
st = jnp.concatenate([x0, p_ee, spatial.rot_to_quat(R_ee)])
targets = TargetTrajectories.create(jnp.array([0.0, 1e5]), jnp.stack([st, st]), jnp.zeros((2, 30)))
sched = GaitSchedule(); sched.insert_template(GAIT_LIBRARY["trot"], 0.0, 20.0)
ocp = make_ocp_config(model, cfg)
solver = SqpSolver(model, ocp, cfg)
controller = QmController(model, cfg)

kf = KalmanFilterEstimate(model)
kf.reset(sim.q)
v_prev = sim.v
rbd_est = measured_rbd(model, sim)

stage = build_stage_data(model, cfg, sched, targets, 0.0)
x_obs = centroidal.centroidal_state_from_rbd(model, rbd_est)
sol = solver.solve(stage, x_obs)
sol = solver.solve(stage, x_obs, warm=(sol.times, sol.X, sol.U))
policy = PolicyStore(times=sol.times, X=sol.X, U=sol.U)
wbc_state = WbcState.init(dtype=jnp.float64)
dt = sc.dt
command = None
for step in range(1500):
    t = step * dt
    if step % 10 == 0 and step > 0:
        x_obs = centroidal.centroidal_state_from_rbd(model, rbd_est)
        stage = build_stage_data(model, cfg, sched, targets, t)
        sol = solver.solve(stage, x_obs, warm=(sol.times, sol.X, sol.U))
        policy = PolicyStore(times=sol.times, X=sol.X, U=sol.U)
    if step % 2 == 0 or command is None:
        flags = jnp.asarray(sched.contact_flags_at(t), dtype=jnp.float64)
        res = controller.tick(policy, flags, rbd_est, wbc_state, t, 2 * dt)
        wbc_state = res.wbc_state
        command = jnp.stack([res.command.pos_des, res.command.vel_des,
                             res.command.kp, res.command.kd, res.command.tau_ff])
    sim = sim_step(model, sc, sim, command)
    # ground-truth closed loop:
    rbd_est = measured_rbd(model, sim)
    # KF shadow on the same stream
    a_w = (sim.v[0:3] - v_prev[0:3]) / dt
    v_prev = sim.v
    zyx, omega_w, acc_body = imu_from_state(model, sim.q, sim.v, a_w)
    from qm_door_tpu.sim.sim import contact_flags_from_sim
    kf_flags = jnp.asarray(contact_flags_from_sim(model, sim.q, cfg=sc), dtype=jnp.float64)
    pf = kf.state.xe[6:18].reshape(4, 3)
    th = terrain.terrain_height(sc.terrain, pf[:, 0], pf[:, 1], sc.terrain_params)
    rbd_kf = kf.update(zyx, omega_w, acc_body, sim.q[6:24], sim.v[6:24], kf_flags, dt, terrain_height=th)
    if step % 100 == 0:
        ep = np.asarray(rbd_kf[3:6]) - np.asarray(rbd_est[3:6])
        ev = np.asarray(rbd_kf[27:30]) - np.asarray(rbd_est[27:30])
        print(f"t={t:4.2f} pos err {np.abs(ep).max():.4f} ({ep[0]:+.4f},{ep[1]:+.4f},{ep[2]:+.4f}) "
              f"vel err {np.abs(ev).max():.4f} ({ev[0]:+.4f},{ev[1]:+.4f},{ev[2]:+.4f})")
