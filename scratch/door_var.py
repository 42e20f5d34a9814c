"""Door scenario variant runner: python door_var.py <tag> key=val ...

Prints a dense trace around the coast/release window plus the summary.
"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np
from qm_door_tpu.config import default_config
from qm_door_tpu.models import aliengo_z1
from qm_door_tpu.sim.door_loop import DoorOpeningRunner, DoorScenario

tag = sys.argv[1]
over = {}
for kv in sys.argv[2:]:
    k, v = kv.split("=")
    over[k] = (v == "True") if v in ("True", "False") else (
        None if v == "None" else float(v))
prio = int(over.pop("prio", 0))
dur = float(over.pop("duration", 6.5))
sc = DoorScenario()._replace(**over)

model = aliengo_z1()
cfg = default_config()
cfg.controller.leg_pd_start_time = -1.0
cfg.wbc.arm_init_time = -1.0
cfg.force_tracking.wrench_priority = prio
runner = DoorOpeningRunner(model, cfg, scenario=sc)
log = runner.run(duration=dur)
panel = np.asarray(log.panel); lever = np.asarray(log.lever)
base = np.stack(log.base_pose); viol = np.asarray(log.mpc_viol)
t_coast = getattr(runner, "_t_coast", None)
t_done = getattr(runner, "_t_done", None)
print(f"[{tag}] prio={prio} safe={log.safe} t_end={log.t[-1]:.2f} "
      f"t_coast={t_coast} t_done={t_done} "
      f"panel_min={panel.min():.3f} panel_end={panel[-1]:.3f} "
      f"viol_med={np.median(viol):.2e} viol_end={viol[-1]:.2e}")
t = np.asarray(log.t)
t0 = (t_coast - 0.3) if t_coast else t[-1] - 1.5
sel = np.where(t >= t0)[0][::25]  # every 0.1 s
for j in sel:
    print(f"[{tag}]  t={t[j]:.2f} xyz={np.round(base[j,0:3],3)} "
          f"ypr={np.round(base[j,3:6],3)} panel={panel[j]:.3f}")
print(f"[{tag}] final pose={np.round(base[-1],3)}")
