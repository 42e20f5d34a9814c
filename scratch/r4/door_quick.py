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

dur = float(os.environ.get("QM_DUR", "6.5"))
model = aliengo_z1()
cfg = default_config()
cfg.controller.leg_pd_start_time = -1.0
cfg.wbc.arm_init_time = -1.0
runner = DoorOpeningRunner(model, cfg)
t0 = time.time()
log = runner.run(duration=dur)
viol = np.asarray(log.mpc_viol); base = np.stack(log.base_pose)
panel = np.asarray(log.panel)
print(f"wall={time.time()-t0:.0f}s safe={log.safe} t_end={log.t[-1]:.2f} "
      f"panel_min={panel.min():.3f} panel_end={panel[-1]:.3f} "
      f"tilt_max={np.abs(base[:,4:6]).max():.3f} "
      f"viol_med={np.median(viol):.3e} viol_end={viol[-1]:.3e}")
