#!/usr/bin/env python
"""Stairs-ascent diagnostic: closed-loop trot up a staircase (config #3).

The target trajectory walks the base forward at constant velocity with the
height reference following the terrain height-field (the role of the
reference's elevation-mapped cmd_vel pipeline on its terrain worlds);
per-foot swing liftoff/touchdown heights come from ClosedLoopRunner's
terrain-aware SwingTrajectoryPlanner equivalent.

Usage: python tools/stairs_diag.py [duration] [vx] [rise]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np


def run_stairs(duration=3.0, v=0.3, rise=0.06, x_start=0.4, run_depth=0.3,
               n_steps=4.0):
    from qm_door_tpu.config import default_config
    from qm_door_tpu.models import aliengo_z1
    from qm_door_tpu.ocp.gait import GAIT_LIBRARY, GaitSchedule
    from qm_door_tpu.scenarios import walk_targets
    from qm_door_tpu.sim.closed_loop import ClosedLoopRunner
    from qm_door_tpu.sim.sim import SimConfig

    model = aliengo_z1()
    cfg = default_config()
    cfg.controller.leg_pd_start_time = -1.0
    cfg.wbc.arm_init_time = -1.0

    params = (x_start, run_depth, rise, n_steps)
    sim_cfg = SimConfig(terrain="stairs", terrain_params=params)
    sched = GaitSchedule()
    sched.insert_template(GAIT_LIBRARY["trot"], 0.0, duration + 5.0)
    runner = ClosedLoopRunner(model, cfg, schedule=sched, sim_cfg=sim_cfg)
    targets = walk_targets(model, cfg, v, duration, sim_cfg)
    log = runner.run(targets, duration=duration)
    return log, params


def main():
    duration = float(sys.argv[1]) if len(sys.argv) > 1 else 3.0
    v = float(sys.argv[2]) if len(sys.argv) > 2 else 0.3
    rise = float(sys.argv[3]) if len(sys.argv) > 3 else 0.06
    log, params = run_stairs(duration=duration, v=v, rise=rise)

    from qm_door_tpu.sim import terrain

    base = np.stack(log.base_pose)
    t_arr = np.asarray(log.t)
    print("   t     x      z     terrain  pitch   viol")
    viol = {t: v_ for t, v_ in zip(
        np.asarray(log.t)[::10][:len(log.mpc_viol)], log.mpc_viol)}
    for i in range(0, len(t_arr), 50):
        zt = float(terrain.terrain_height(
            "stairs", jnp.asarray(base[i, 0]), jnp.asarray(0.0), params))
        print(f"{t_arr[i]:6.2f} {base[i,0]:+.3f} {base[i,2]:+.3f}   {zt:+.3f}"
              f"  {base[i,4]:+.3f}")
    zt_end = float(terrain.terrain_height(
        "stairs", jnp.asarray(base[-1, 0]), jnp.asarray(0.0), params))
    print(f"safe: {log.safe}  final x {base[-1,0]:.3f}  "
          f"final z {base[-1,2]:.3f}  terrain {zt_end:.3f}  "
          f"climb {base[-1,2]-base[0,2]:.3f}  "
          f"viol max {max(log.mpc_viol):.2e} last {log.mpc_viol[-1]:.2e}")


if __name__ == "__main__":
    main()
