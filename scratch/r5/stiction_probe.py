"""Open-loop-ish probe: replay the first 0.6 s of GT trot with stiction,
print per-foot fz/ft/anchor gap each 20 ms."""
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
from qm_door_tpu.sim.sim import SimConfig, measured_rbd, sim_init, sim_step, _contact_forces
from qm_door_tpu.wbc.wbc import WbcState

model = aliengo_z1()
cfg = default_config()
cfg.controller.leg_pd_start_time = -1.0
cfg.wbc.arm_init_time = -1.0
x0 = jnp.asarray(cfg.initial_state())
q0 = centroidal.pinocchio_q(x0)
feet_z = float(jnp.mean(kinematics.contact_positions(model, q0)[:, 2]))
q0 = q0.at[2].add(-feet_z)
sc = SimConfig(tangential_stiffness=float(os.environ.get("QM_KT", "20000")))
sim = sim_init(model, q0, cfg=sc)
R_ee, p_ee = kinematics.ee_pose(model, q0)
st = jnp.concatenate([x0, p_ee, spatial.rot_to_quat(R_ee)])
targets = TargetTrajectories.create(jnp.array([0.0, 1e5]), jnp.stack([st, st]), jnp.zeros((2, 30)))
sched = GaitSchedule(); sched.insert_template(GAIT_LIBRARY["trot"], 0.0, 20.0)
ocp = make_ocp_config(model, cfg)
solver = SqpSolver(model, ocp, cfg)
controller = QmController(model, cfg)
rbd_est = measured_rbd(model, sim)
stage = build_stage_data(model, cfg, sched, targets, 0.0)
x_obs = centroidal.centroidal_state_from_rbd(model, rbd_est)
sol = solver.solve(stage, x_obs)
sol = solver.solve(stage, x_obs, warm=(sol.times, sol.X, sol.U))
policy = PolicyStore(times=sol.times, X=sol.X, U=sol.U)
wbc_state = WbcState.init(dtype=jnp.float64)
dt = sc.dt
command = None
for step in range(600):
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
    F, J, ic, anew = _contact_forces(model, sc, sim.q, sim.v, sim.anchor)
    if step % 20 == 0:
        p = kinematics.contact_positions(model, sim.q)
        gap = np.linalg.norm(np.asarray(p[:, :2] - sim.anchor), axis=1)
        print(f"t={t:4.2f} fz={np.array2string(np.asarray(F[:,2]), precision=0)} "
              f"ft={np.array2string(np.linalg.norm(np.asarray(F[:,:2]),axis=1), precision=1)} "
              f"gap={np.array2string(gap*1000, precision=1)}mm ic={np.asarray(ic).astype(int)}")
    sim = sim_step(model, sc, sim, command)
    rbd_est = measured_rbd(model, sim)
