#!/usr/bin/env python
"""Run any registry scenario closed-loop (the `roslaunch <world>` role).

    python examples/scenario_demo.py [name] [duration_s] [--separated]

Names: empty, mobile, stairs, sar, pallets, tunnel, vchimney, maze,
push_door (see qm_door_tpu/scenarios.py). Writes <name>_report.png.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    name = args[0] if args else "empty"
    duration = float(args[1]) if len(args) > 1 else 3.0
    separated = "--separated" in sys.argv

    from qm_door_tpu.scenarios import DOOR_SCENARIOS, make_scenario

    runner, targets = make_scenario(name, duration=duration,
                                    separated=separated)
    if name in DOOR_SCENARIOS:
        log = runner.run(duration=duration)
        panel = np.asarray(log.panel)
        print(f"safe: {log.safe}  panel min {panel.min():.3f} rad")
        return

    log = runner.run(targets, duration=duration)
    base = np.stack(log.base_pose)
    print(f"safe: {log.safe}")
    print(f"final base pose {np.array2string(base[-1], precision=3)}")
    print(f"MPC violation last {log.mpc_viol[-1]:.2e}")

    from qm_door_tpu.utils.dashboard import flight_report

    path = flight_report(log, f"{name}_report.png",
                         f"{name} scenario ({duration:.1f}s)")
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
