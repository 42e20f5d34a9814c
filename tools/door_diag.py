#!/usr/bin/env python
"""Door-opening diagnostic: per-MPC-cycle phase/violation/panel table."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np

from qm_door_tpu.config import default_config
from qm_door_tpu.models import aliengo_z1
from qm_door_tpu.sim.door_loop import DoorOpeningRunner


def main():
    duration = float(sys.argv[1]) if len(sys.argv) > 1 else 4.0
    model = aliengo_z1()
    cfg = default_config()
    cfg.controller.leg_pd_start_time = -1.0
    cfg.wbc.arm_init_time = -1.0

    runner = DoorOpeningRunner(model, cfg)
    log = runner.run(duration=duration)

    panel = np.asarray(log.panel)
    t_arr = np.asarray(log.t)
    print("   t   phase    viol      panel   lever")
    for i, (tm, ph, vi) in enumerate(zip(log.mpc_t, log.mpc_phase, log.mpc_viol)):
        j = int(np.searchsorted(t_arr, tm))
        j = min(j, len(panel) - 1)
        print(f"{tm:6.2f} {ph:>6} {vi:9.2e} {panel[j]:8.3f} {log.lever[j]:7.3f}")
    print(f"safe: {log.safe}  panel min {panel.min():.3f}  "
          f"ee_err max {max(log.ee_err)*1000:.0f} mm")
    print("--- base pose every 0.1 s: t, base xyz, zyx (rad), ee_err mm ---")
    bp = np.asarray(log.base_pose)
    for i in range(0, len(t_arr), 25):
        print(f"{t_arr[i]:6.2f}  xyz {bp[i,0]:+.3f} {bp[i,1]:+.3f} {bp[i,2]:+.3f}"
              f"  zyx {bp[i,3]:+.3f} {bp[i,4]:+.3f} {bp[i,5]:+.3f}"
              f"  ee {log.ee_err[i]*1000:6.0f}")
    print("--- last 60 control rows ---")
    for i in range(max(0, len(t_arr) - 60), len(t_arr), 2):
        print(f"{t_arr[i]:6.2f}  xyz {bp[i,0]:+.3f} {bp[i,1]:+.3f} {bp[i,2]:+.3f}"
              f"  zyx {bp[i,3]:+.3f} {bp[i,4]:+.3f} {bp[i,5]:+.3f}"
              f"  ee {log.ee_err[i]*1000:6.0f}")


if __name__ == "__main__":
    main()
