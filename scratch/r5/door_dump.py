"""Short door run with feet-z dump around the release dip."""
import os, sys, json
sys.path.insert(0, "/root/repo")
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np
from qm_door_tpu.config import default_config
from qm_door_tpu.models import aliengo_z1
from qm_door_tpu.sim.door_loop import DoorOpeningRunner, DoorScenario

overrides = json.loads(os.environ.get("QM_SC", "{}"))
model = aliengo_z1()
cfg = default_config()
cfg.controller.leg_pd_start_time = -1.0
cfg.wbc.arm_init_time = -1.0
runner = DoorOpeningRunner(model, cfg, scenario=DoorScenario(**overrides))
dur = float(os.environ.get("QM_DUR", "4.3"))
log = runner.run(duration=dur)
t = np.asarray(log.t); base = np.stack(log.base_pose); fz = np.stack(log.feet_z)
panel = np.asarray(log.panel)
print("safe", log.safe, "t_end", t[-1], "t_done", getattr(runner, "_t_coast", None), getattr(runner, "_t_done", None))
np.savez("/root/repo/scratch/r5/dump.npz", t=t, base=base, feet_z=fz, panel=panel,
         viol=np.asarray(log.mpc_viol), mpc_t=np.asarray(log.mpc_t))
sel = t > 2.5
for i in np.nonzero(sel)[0][::10]:
    b = base[i]
    print(f"t={t[i]:4.2f} z={b[2]:+.3f} pr=({b[4]:+.2f},{b[5]:+.2f}) "
          f"feet_z={np.array2string(fz[i], precision=3)} panel={panel[i]:+.2f}")
