"""Does the slip gate keep the KF-trot loop alive on the creep plant?
(round-5 gate experiment; noise-free sensors — the xfail reproduces there)"""
import os
os.environ["JAX_PLATFORMS"]="cpu"
import jax
jax.config.update("jax_platforms","cpu")
import sys
import numpy as np, jax.numpy as jnp
from qm_door_tpu.config import default_config
from qm_door_tpu.models import aliengo_z1, kinematics, spatial
from qm_door_tpu.ocp.gait import GAIT_LIBRARY, GaitSchedule
from qm_door_tpu.ocp.reference import TargetTrajectories
from qm_door_tpu.sim.closed_loop import ClosedLoopRunner
from qm_door_tpu.estimation import KfParams

gate = float(sys.argv[1]) if len(sys.argv) > 1 else 0.15
dur = float(sys.argv[2]) if len(sys.argv) > 2 else 5.0
model = aliengo_z1()
cfg = default_config()
cfg.controller.leg_pd_start_time = -1.0
cfg.wbc.arm_init_time = -1.0
x0 = jnp.asarray(cfg.initial_state())
R_ee, p_ee = kinematics.ee_pose(model, x0[6:30])
quat = spatial.rot_to_quat(R_ee)
t_state = jnp.concatenate([x0, p_ee, quat])
targets = TargetTrajectories.create(jnp.array([0.0, 1e5]), jnp.stack([t_state]*2), jnp.zeros((2,30)))
sched = GaitSchedule(); sched.insert_template(GAIT_LIBRARY["trot"], 0.0, dur+5.0)
kp = KfParams(slip_gate=gate, slip_inflation=200.0) if gate > 0 else None
runner = ClosedLoopRunner(model, cfg, schedule=sched, estimator="kalman", kf_params=kp)
log = runner.run(targets, duration=dur)
base = np.stack(log.base_pose)
tilt = np.abs(base[:, 3:5]).max()
print(f"gate={gate}: safe={log.safe} t_end={len(base)*0.002:.2f}s "
      f"final_xy={base[-1,0:2]} tilt_max={tilt:.3f} z_final={base[-1,2]:.3f}")
