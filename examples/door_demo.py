#!/usr/bin/env python
"""Closed-loop door-opening demo (BASELINE config #4; the reference's
force-tracking branch running the qm_gazebo push_door world).

Runs the full force-tracking stack — sim(1 kHz) + force-aware WBC(500 Hz) +
36-input NMPC(100 Hz) + articulated door — until the robot has pressed the
lever, released the latch, and swung the panel past the open target.

    python examples/door_demo.py [duration_s]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

# demos run the CPU-reference configuration (f64)
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np

from qm_door_tpu.config import default_config
from qm_door_tpu.models import aliengo_z1
from qm_door_tpu.sim.door_loop import DoorOpeningRunner


def main():
    duration = float(sys.argv[1]) if len(sys.argv) > 1 else 6.5
    model = aliengo_z1()
    cfg = default_config()
    cfg.controller.leg_pd_start_time = -1.0
    cfg.wbc.arm_init_time = -1.0

    runner = DoorOpeningRunner(model, cfg)
    log = runner.run(duration=duration)

    panel = np.asarray(log.panel)
    print(f"safe: {log.safe}")
    print(f"panel angle: final {panel[-1]:.3f} rad, min {panel.min():.3f} rad")
    print(f"lever: min {min(log.lever):.3f} rad")
    print(f"EE-handle err: max {max(log.ee_err)*1000:.1f} mm, "
          f"final {log.ee_err[-1]*1000:.1f} mm")
    print(f"MPC violation (last): {log.mpc_viol[-1]:.2e}")
    opened = panel.min() <= runner.scenario.open_target
    print(f"door opened past {runner.scenario.open_target} rad: {opened}")

    # door-opening dashboard: panel/lever trajectories + base pose
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    t = np.asarray(log.t)
    base = np.stack(log.base_pose)
    fig, axes = plt.subplots(1, 3, figsize=(15, 4))
    axes[0].plot(t, panel, label="panel")
    axes[0].plot(t, np.asarray(log.lever), label="lever")
    axes[0].axhline(runner.scenario.open_target, ls="--", c="gray", lw=0.8)
    axes[0].set_title("door joints (rad)")
    axes[0].legend()
    axes[1].plot(t, base[:, 0:3])
    axes[1].set_title("base position")
    axes[1].legend(["x", "y", "z"], fontsize=8)
    axes[2].semilogy(np.asarray(log.mpc_t), np.maximum(log.mpc_viol, 1e-12))
    axes[2].set_title("MPC constraint violation")
    fig.tight_layout()
    fig.savefig("door_demo.png", dpi=110)
    print("wrote door_demo.png")


if __name__ == "__main__":
    main()
