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


if __name__ == "__main__":
    main()
