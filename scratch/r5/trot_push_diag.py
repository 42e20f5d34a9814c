"""Hypothesis test: ground-truth trot + constant small lateral force."""
import os, sys, json
sys.path.insert(0, "/root/repo")
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np, jax.numpy as jnp
from qm_door_tpu.config import default_config
from qm_door_tpu.models import aliengo_z1, kinematics, spatial
from qm_door_tpu.ocp.gait import GAIT_LIBRARY, GaitSchedule
from qm_door_tpu.ocp.reference import TargetTrajectories
from qm_door_tpu.sim.closed_loop import ClosedLoopRunner

fy = float(os.environ.get("QM_FY", "5.0"))
model = aliengo_z1()
cfg = default_config()
cfg.controller.leg_pd_start_time = -1.0
cfg.wbc.arm_init_time = -1.0
x0 = jnp.asarray(cfg.initial_state())
R_ee, p_ee = kinematics.ee_pose(model, x0[6:30])
st = jnp.concatenate([x0, p_ee, spatial.rot_to_quat(R_ee)])
targets = TargetTrajectories.create(jnp.array([0.0, 1e5]), jnp.stack([st, st]), jnp.zeros((2, 30)))
sched = GaitSchedule(); sched.insert_template(GAIT_LIBRARY["trot"], 0.0, 20.0)
from qm_door_tpu.sim.sim import SimConfig
kt = float(os.environ.get("QM_KT", "20000.0"))
runner = ClosedLoopRunner(model, cfg, schedule=sched, sim_cfg=SimConfig(tangential_stiffness=kt))
w = np.zeros(6); w[1] = fy
log = runner.run(targets, duration=float(os.environ.get("QM_DUR", "8.0")),
                 external_wrench_fn=lambda t: w)
base = np.stack(log.base_pose)
print("safe", log.safe, "t_end", log.t[-1], "tilt_max", np.abs(base[:,4:6]).max())
for i in range(0, len(log.t), 150):
    b = base[i]
    print(f"t={log.t[i]:4.2f} z={b[2]:+.3f} xy=({b[0]:+.3f},{b[1]:+.3f}) yaw={b[3]:+.2f} pr=({b[4]:+.2f},{b[5]:+.2f})")
