#!/usr/bin/env python
"""End-effector goal tracking demo (the RViz interactive-marker flow).

Commands the arm EE to a goal pose through the same converter the reference's
marker/planner uses (EEgoalPoseToTargetTrajectories) while holding stance.

    python examples/ee_tracking_demo.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

# demos run the CPU-reference configuration (f64)
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from qm_door_tpu.config import default_config
from qm_door_tpu.models import aliengo_z1, kinematics, spatial
from qm_door_tpu.runtime.targets import ee_goal_to_target_trajectories
from qm_door_tpu.sim.closed_loop import ClosedLoopRunner


def main():
    model = aliengo_z1()
    cfg = default_config()
    cfg.controller.leg_pd_start_time = -1.0
    cfg.wbc.arm_init_time = -1.0

    x0 = np.asarray(cfg.initial_state())
    q0 = jnp.asarray(x0[6:30])
    R_ee, p_ee = kinematics.ee_pose(model, q0)
    quat = np.asarray(spatial.rot_to_quat(R_ee))
    ee_state = np.concatenate([np.asarray(p_ee), quat])

    goal = np.asarray(p_ee) + np.array([0.08, 0.05, 0.05])
    targets = ee_goal_to_target_trajectories(
        goal, quat, x0, ee_state, 0.0, cfg, feet_height=0.0
    )

    runner = ClosedLoopRunner(model, cfg)
    log = runner.run(targets, duration=1.5)
    ee = np.stack(log.ee_pos)
    err = np.linalg.norm(ee[-1] - goal)
    print(f"safe: {log.safe}; EE goal error after 1.5 s: {err*100:.1f} cm")
    print(f"EE path: start {np.round(ee[0],3)} -> end {np.round(ee[-1],3)} (goal {np.round(goal,3)})")


if __name__ == "__main__":
    main()
