#!/usr/bin/env python
"""Closed-loop trot demo (the `qm_gazebo empty_world + load_controller` role).

Runs the full stack — sim(1 kHz) + WBC(500 Hz) + NMPC(100 Hz) — for a few
seconds of trotting on flat ground and renders the trajectory.

    python examples/trot_demo.py [duration_s]
"""
import sys

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
from qm_door_tpu.ocp.gait import GAIT_LIBRARY, GaitSchedule
from qm_door_tpu.ocp.reference import TargetTrajectories
from qm_door_tpu.sim.closed_loop import ClosedLoopRunner
from qm_door_tpu.utils.dashboard import flight_report
from qm_door_tpu.utils.viz import plot_closed_loop


def main():
    duration = float(sys.argv[1]) if len(sys.argv) > 1 else 2.0
    model = aliengo_z1()
    cfg = default_config()
    cfg.controller.leg_pd_start_time = -1.0
    cfg.wbc.arm_init_time = -1.0

    x0 = jnp.asarray(cfg.initial_state())
    R_ee, p_ee = kinematics.ee_pose(model, x0[6:30])
    quat = spatial.rot_to_quat(R_ee)
    state = jnp.concatenate([x0, p_ee, quat])
    targets = TargetTrajectories.create(
        jnp.array([0.0, 1e5]), jnp.stack([state, state]), jnp.zeros((2, 30))
    )

    sched = GaitSchedule()
    sched.insert_template(GAIT_LIBRARY["trot"], 0.0, duration + 5.0)
    runner = ClosedLoopRunner(model, cfg, schedule=sched)
    log = runner.run(targets, duration=duration)

    base = np.stack(log.base_pose)
    print(f"safe: {log.safe}; final base pose: {np.round(base[-1], 3)}")
    print(f"MPC violation (last): {log.mpc_viol[-1]:.2e}")
    path = plot_closed_loop(log, "trot_demo.png", f"{duration:.1f}s trot")
    flight_report(log, "trot_report.png", f"{duration:.1f}s trot flight report")
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
