"""A/B the door golden under wrench_priority 2 (round-2 tuned) vs HEAD default 0."""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np
from qm_door_tpu.config import default_config
from qm_door_tpu.models import aliengo_z1
from qm_door_tpu.sim.door_loop import DoorOpeningRunner

prio = int(sys.argv[1])
model = aliengo_z1()
cfg = default_config()
cfg.controller.leg_pd_start_time = -1.0
cfg.wbc.arm_init_time = -1.0
cfg.force_tracking.wrench_priority = prio
runner = DoorOpeningRunner(model, cfg)
log = runner.run(duration=6.5)
panel = np.asarray(log.panel); lever = np.asarray(log.lever)
base = np.stack(log.base_pose); viol = np.asarray(log.mpc_viol)
print(f"prio={prio} safe={log.safe} t_end={log.t[-1]:.2f} "
      f"panel_min={panel.min():.3f} panel_end={panel[-1]:.3f} "
      f"lever_min={lever.min():.3f} "
      f"tilt_end={np.abs(base[-1,4:6]).max():.3f} z_end={base[-1,2]:.3f} "
      f"viol_med={np.median(viol):.2e} viol_end={viol[-1]:.2e}")
# phase trace around the end
for i in range(max(0, len(log.mpc_t)-12), len(log.mpc_t)):
    print(f"  t={log.mpc_t[i]:.2f} phase={log.mpc_phase[i]} viol={log.mpc_viol[i]:.2e}")
print("last base poses:")
for j in range(max(0, len(log.t)-5), len(log.t)):
    print(f"  t={log.t[j]:.2f} pose={np.round(log.base_pose[j],3)} panel={log.panel[j]:.3f}")
