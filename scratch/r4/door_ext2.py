import os, sys
sys.path.insert(0, os.environ.get("QM_REPO", "/root/repo"))
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import time
import numpy as np
from qm_door_tpu.config import default_config
from qm_door_tpu.models import aliengo_z1
from qm_door_tpu.sim.door_loop import DoorOpeningRunner

dur = float(os.environ.get("QM_DUR", "11.0"))
model = aliengo_z1()
cfg = default_config()
cfg.controller.leg_pd_start_time = -1.0
cfg.wbc.arm_init_time = -1.0
runner = DoorOpeningRunner(model, cfg)
t0 = time.time()
log = runner.run(duration=dur)
viol = np.asarray(log.mpc_viol); base = np.stack(log.base_pose)
panel = np.asarray(log.panel); mpc_t = np.asarray(log.mpc_t)
phases = np.asarray(log.mpc_phase)
print(f"wall={time.time()-t0:.0f}s safe={log.safe} t_end={log.t[-1]:.2f} "
      f"panel_end={panel[-1]:.3f} tilt_max={np.abs(base[:,4:6]).max():.3f}")
for ph in sorted(set(phases.tolist())):
    m = phases == ph
    v = viol[m]
    print(f"  {ph:6s} n={m.sum():4d} median={np.median(v):.3e} max={v.max():.3e}")
t_done = getattr(runner, "_t_done", None)
print("t_done:", t_done)
if t_done and log.safe:
    tail = viol[mpc_t > t_done + 1.0]
    print("post-release(+1s on) median/max:", np.median(tail), tail.max())
