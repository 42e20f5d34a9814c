"""Round-4 diag: extended door run (>=5 s post-release) + violation stats."""
import os
import sys
sys.path.insert(0, "/root/repo")
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import time
import numpy as np
from qm_door_tpu.config import default_config
from qm_door_tpu.models import aliengo_z1
from qm_door_tpu.sim.door_loop import DoorOpeningRunner

model = aliengo_z1()
cfg = default_config()
cfg.controller.leg_pd_start_time = -1.0
cfg.wbc.arm_init_time = -1.0

runner = DoorOpeningRunner(model, cfg)
t0 = time.time()
log = runner.run(duration=11.0)
print(f"wall: {time.time()-t0:.0f}s  safe={log.safe}")
panel = np.asarray(log.panel); lever = np.asarray(log.lever)
base = np.stack(log.base_pose); viol = np.asarray(log.mpc_viol)
mpc_t = np.asarray(log.mpc_t); phases = np.asarray(log.mpc_phase)
print("panel min/final:", panel.min(), panel[-1])
print("lever min:", lever.min())
print("base final z/tilt:", base[-1, 2], np.abs(base[-1, 4:6]).max())
print("base z min:", base[:, 2].min(), "tilt max:", np.abs(base[:, 4:6]).max())
print("viol median/final/max:", np.median(viol), viol[-1], viol.max())
for ph in ("reach", "press", "push", "coast", "done"):
    m = phases == ph
    if m.any():
        v = viol[m]
        print(f"  {ph:6s} n={m.sum():4d} median={np.median(v):.3e} max={v.max():.3e} last={v[-1]:.3e}")
# time of release
t_done = getattr(runner, "_t_done", None)
print("t_done:", t_done, " post-release window:", (11.0 - t_done) if t_done else None)
# tail violations (last 2 s)
tail = viol[mpc_t > (mpc_t[-1] - 2.0)]
print("tail-2s viol median/max:", np.median(tail), tail.max())
np.savez("/root/repo/scratch/r4/door_extended.npz", panel=panel, lever=lever,
         base=base, viol=viol, mpc_t=mpc_t, phases=phases)
