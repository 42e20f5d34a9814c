#!/usr/bin/env python
"""Weak-scaling probe on a virtual 8-device CPU mesh (BASELINE.md scaling row).

Real multi-chip hardware is unavailable in this environment (one tunneled
v5e), so the standing scaling artifact is measured where it CAN be: the same
sharded BatchedMpc path the driver's dryrun compiles, on
xla_force_host_platform_device_count=8 CPU devices. Weak scaling: fixed
batch-per-device, 1-device mesh vs 8-device mesh; efficiency =
t_1dev / t_8dev (per-problem time ratio; 1.0 = perfect). CPU "devices" share
the host's memory bus so this is a LOWER bound on ICI scaling — the point is
a standing, self-filling report slot (bench.py embeds the result), not a
substitute for the hardware measurement.

Prints ONE JSON line. Invoked by bench.py in a subprocess (the TPU process
cannot also host the CPU mesh); standalone use:
  python tools/scaling_probe.py
"""
import json
import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import jax.numpy as jnp
import numpy as np


def main():
    per_dev = int(os.environ.get("QM_SCALING_BATCH", "8"))
    reps = int(os.environ.get("QM_SCALING_REPS", "3"))

    from qm_door_tpu.config import default_config
    from qm_door_tpu.models import aliengo_z1, kinematics, spatial
    from qm_door_tpu.ocp.gait import GAIT_LIBRARY, GaitSchedule
    from qm_door_tpu.ocp.problem import build_stage_data, make_ocp_config
    from qm_door_tpu.ocp.reference import TargetTrajectories
    from qm_door_tpu.parallel.batched import BatchedMpc
    from qm_door_tpu.parallel.mesh import scenario_mesh, shard_batch
    from qm_door_tpu.solver.sqp import SqpSolver

    dtype = jnp.float32
    model = aliengo_z1(dtype=dtype)
    cfg = default_config()
    ocp = make_ocp_config(model, cfg, dtype=dtype)
    solver = SqpSolver(model, ocp, cfg)

    x0 = jnp.asarray(cfg.initial_state(), dtype=dtype)
    R_ee, p_ee = kinematics.ee_pose(model, x0[6:30])
    quat = spatial.rot_to_quat(R_ee)
    tstate = jnp.concatenate([x0, p_ee, quat])
    targets = TargetTrajectories.create(
        jnp.array([0.0, 1e5], dtype=dtype),
        jnp.stack([tstate, tstate]),
        jnp.zeros((2, 30), dtype=dtype),
    )
    sched = GaitSchedule()
    sched.insert_template(GAIT_LIBRARY["trot"], 0.0, 5.0)
    stage = build_stage_data(model, cfg, sched, targets, 0.0, dtype=dtype)
    rng = np.random.default_rng(0)

    def run(n_dev):
        b = per_dev * n_dev
        mesh = scenario_mesh(n_devices=n_dev)
        x_batch = jnp.asarray(
            np.asarray(x0)[None] + rng.normal(size=(b, 30)) * 0.02, dtype=dtype)
        mpc = BatchedMpc(solver, mesh=mesh, backend="bm_xla")
        x_batch = shard_batch(x_batch, mesh)
        X, U = mpc.cold_start(stage, x_batch)
        X, U, _ = mpc.step(stage, x_batch, X, U)  # compile
        jax.block_until_ready(X)
        t0 = time.time()
        for _ in range(reps):
            X, U, _ = mpc.step(stage, x_batch, X, U)
        jax.block_until_ready(X)
        dt = (time.time() - t0) / reps
        return b * reps / (dt * reps), dt

    sps1, t1 = run(1)
    sps8, t8 = run(8)
    # weak scaling: same per-device work, efficiency = t1/t8
    print(json.dumps({
        "kind": "weak_scaling_cpu_mesh",
        "devices": [1, 8],
        "batch_per_device": per_dev,
        "solves_per_s": [round(sps1, 1), round(sps8, 1)],
        "efficiency": round(t1 / t8, 4),
        "note": "virtual CPU devices share one memory bus; lower bound",
    }))


if __name__ == "__main__":
    main()
