#!/usr/bin/env python
"""Extract AlienGo+Z1 model constants from a URDF into assets/aliengo_z1.json.

Usage: python tools/extract_model.py [urdf_path]
"""
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from qm_door_tpu.models.urdf import compile_urdf
from qm_door_tpu.models.model import JOINT_NAMES, CONTACT_FRAMES, EE_FRAME, BASE_FRAME


def main():
    urdf = (
        sys.argv[1]
        if len(sys.argv) > 1
        else "/root/reference/qm_description/urdf/quadruped_manipulator/robot.urdf"
    )
    frames = [BASE_FRAME, *CONTACT_FRAMES, EE_FRAME, "unitree_imu"]
    d = compile_urdf(urdf, list(JOINT_NAMES), frames)
    out = os.path.join(os.path.dirname(__file__), "..", "qm_door_tpu", "assets", "aliengo_z1.json")
    with open(out, "w") as f:
        json.dump(d, f, indent=1)
    total = sum(d["body_mass"])
    print(f"wrote {out}: {len(d['joint_names'])} joints, total mass {total:.4f} kg")


if __name__ == "__main__":
    main()
