#!/usr/bin/env python
"""Cross-precision validation: one MPC solve on the attached TPU (f32) vs the
CPU f64 reference. Reports trajectory/torque deviations — the 'bit-tolerant
match' guardrail of BASELINE.md running against our own f64 solution.

Usage: python tools/tpu_check.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def solve_on(platform, dtype_name):
    import subprocess, json, tempfile

    code = f"""
import jax, json
jax.config.update('jax_platforms', '{platform}')
{"jax.config.update('jax_enable_x64', True)" if dtype_name == 'float64' else ''}
import jax.numpy as jnp
import numpy as np
from qm_door_tpu.config import default_config
from qm_door_tpu.models import aliengo_z1, kinematics, spatial
from qm_door_tpu.ocp.gait import GAIT_LIBRARY, GaitSchedule
from qm_door_tpu.ocp.problem import build_stage_data, make_ocp_config
from qm_door_tpu.ocp.reference import TargetTrajectories
from qm_door_tpu.solver.sqp import SqpSolver

dtype = jnp.{dtype_name}
model = aliengo_z1(dtype=dtype)
cfg = default_config()
cfg.sqp.sqp_iterations = 3
ocp = make_ocp_config(model, cfg, dtype=dtype)
solver = SqpSolver(model, ocp, cfg)
x0 = jnp.asarray(cfg.initial_state(), dtype=dtype)
R_ee, p_ee = kinematics.ee_pose(model, x0[6:30])
quat = spatial.rot_to_quat(R_ee)
tstate = jnp.concatenate([x0, p_ee, quat])
targets = TargetTrajectories.create(jnp.array([0.0, 1e5], dtype=dtype),
    jnp.stack([tstate, tstate]), jnp.zeros((2, 30), dtype=dtype))
sched = GaitSchedule(); sched.insert_template(GAIT_LIBRARY['trot'], 0.0, 5.0)
stage = build_stage_data(model, cfg, sched, targets, 0.0, dtype=dtype)
sol = solver.solve(stage, x0)
out = dict(X=np.asarray(sol.X).tolist(), U=np.asarray(sol.U).tolist(),
           cost=float(sol.cost), viol=float(sol.constraint_violation),
           alpha=float(sol.step_size))
print("RESULT" + json.dumps(out))
"""
    res = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        cwd=os.path.join(os.path.dirname(__file__), ".."), timeout=1200,
    )
    for line in res.stdout.splitlines():
        if line.startswith("RESULT"):
            return json.loads(line[6:])
    raise RuntimeError(f"no result from {platform}:\n{res.stderr[-3000:]}")


import json

if __name__ == "__main__":
    ref = solve_on("cpu", "float64")
    tpu = solve_on(os.environ.get("QM_TPU_PLATFORM", "axon"), "float32")
    X_err = np.abs(np.asarray(tpu["X"]) - np.asarray(ref["X"])).max()
    U_err = np.abs(np.asarray(tpu["U"]) - np.asarray(ref["U"])).max()
    F_err = np.abs(np.asarray(tpu["U"])[:, :12] - np.asarray(ref["U"])[:, :12]).max()
    print(json.dumps({
        "X_err_max": float(X_err),
        "U_err_max": float(U_err),
        "force_err_max_N": float(F_err),
        "cpu": {k: ref[k] for k in ("cost", "viol", "alpha")},
        "tpu": {k: tpu[k] for k in ("cost", "viol", "alpha")},
    }, indent=1))
