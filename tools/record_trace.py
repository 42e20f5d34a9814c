#!/usr/bin/env python
"""(Re)record the standing trot golden trace (docs/artifacts/trot_2s_trace.jsonl).

The trace is the frozen behavioral oracle for tests/test_trace_golden.py —
the role the reference's recorded Gazebo runs play when validating controller
changes. Run this ONLY to intentionally re-baseline after a deliberate
behavior change (new solver default, retuned gains), then commit the new
artifact together with the change that motivated it.

Usage: python tools/record_trace.py [duration_s] [out_path]
"""
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np


def canonical_trot_run(duration=2.0):
    """The canonical flat-ground trot run shared by the recorder and the
    golden test: default config, legs commanded from t=0, trot gait, hold
    targets at the spawn pose."""
    import jax.numpy as jnp

    from qm_door_tpu.config import default_config
    from qm_door_tpu.models import aliengo_z1, kinematics, spatial
    from qm_door_tpu.ocp.gait import GAIT_LIBRARY, GaitSchedule
    from qm_door_tpu.ocp.reference import TargetTrajectories
    from qm_door_tpu.sim.closed_loop import ClosedLoopRunner

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
    return runner.run(targets, duration=duration)


def main():
    duration = float(sys.argv[1]) if len(sys.argv) > 1 else 2.0
    out = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(__file__), "..", "docs", "artifacts",
        "trot_2s_trace.jsonl")

    log = canonical_trot_run(duration)
    assert log.safe, "refusing to record an unsafe run"
    with open(out, "w") as f:
        for i, t in enumerate(log.t):
            f.write(json.dumps({
                "t": round(float(t), 6),
                "base_pose": list(np.asarray(log.base_pose[i])),
                "tau": list(np.asarray(log.tau[i])),
                "ee_pos": list(np.asarray(log.ee_pos[i])),
            }) + "\n")
    print(f"wrote {len(log.t)} rows to {out}")
    base = np.stack(log.base_pose)
    print(f"final base pose {np.array2string(base[-1], precision=4)}")


if __name__ == "__main__":
    main()
