import os, sys, json
sys.path.insert(0, os.environ.get("QM_REPO", "/root/repo"))
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import time
import numpy as np
from qm_door_tpu.config import default_config
from qm_door_tpu.models import aliengo_z1
from qm_door_tpu.sim.door_loop import DoorOpeningRunner, DoorScenario

dur = float(os.environ.get("QM_DUR", "11.0"))
overrides = json.loads(os.environ.get("QM_SC", "{}"))
sqp_iters = int(os.environ.get("QM_SQP_ITERS", "0"))
model = aliengo_z1()
cfg = default_config()
cfg.controller.leg_pd_start_time = -1.0
cfg.wbc.arm_init_time = -1.0
if sqp_iters:
    cfg.sqp.sqp_iterations = sqp_iters
sc = DoorScenario(**overrides)
runner = DoorOpeningRunner(model, cfg, scenario=sc)
t0 = time.time()
log = runner.run(duration=dur)
viol = np.asarray(log.mpc_viol); base = np.stack(log.base_pose)
panel = np.asarray(log.panel); mpc_t = np.asarray(log.mpc_t)
phases = np.asarray(log.mpc_phase)
print(f"VARIANT {os.environ.get('QM_TAG','?')}: wall={time.time()-t0:.0f}s "
      f"safe={log.safe} t_end={log.t[-1]:.2f} panel_min={panel.min():.3f} "
      f"panel_end={panel[-1]:.3f} tilt_max={np.abs(base[:,4:6]).max():.3f}")
for ph in sorted(set(phases.tolist())):
    m = phases == ph
    v = viol[m]
    print(f"  {ph:6s} n={m.sum():4d} median={np.median(v):.3e} max={v.max():.3e}")
t_done = getattr(runner, "_t_done", None)
print("t_done:", t_done)
if t_done is not None and log.safe:
    tail = viol[mpc_t > t_done + 1.0]
    if len(tail):
        print("post+1s median/max:", np.median(tail), tail.max())

# full trace dump for post-hoc analysis
tag = os.environ.get("QM_TAG", "x")
t_arr = np.asarray(log.t)
np.savez(f"/root/repo/scratch/r5/trace_{tag}.npz", t=t_arr, base=base,
         panel=panel, viol=viol, mpc_t=mpc_t, phases=phases,
         ee_err=np.asarray(log.ee_err))
sel = t_arr > 2.0
for i in np.nonzero(sel)[0][::25]:
    b = base[i]
    print(f"  t={t_arr[i]:5.2f} x={b[0]:+.3f} y={b[1]:+.3f} z={b[2]:.3f} "
          f"ypr=({b[3]:+.2f},{b[4]:+.2f},{b[5]:+.2f}) panel={panel[i]:+.3f} "
          f"ee_err={log.ee_err[i]:.3f}")
