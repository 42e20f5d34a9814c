#!/usr/bin/env python
"""Multi-process (DCN-role) scenario-parallel MPC worker.

One OS process = one "host" with its own local devices (here: virtual CPU
devices via --xla_force_host_platform_device_count). The driver
(tools/multihost_demo.py or tests/test_multihost.py) launches >= 2 of these;
each feeds its process-local scenario shard into the global mesh with
``mesh.from_process_local`` and runs the SAME jitted BatchedMpc step — the
multi-host story of SURVEY.md §2c / BASELINE.md's >=2-host axis, exercised
end-to-end (jax.distributed.initialize + global array assembly + lock-step
batched solve), with DCN standing in for the real inter-host fabric.

Usage (spawned, not run by hand):
    python tools/multihost_worker.py <rank> <nprocs> <port> <local_batch> [n_local_dev]

Prints one JSON line on every rank: {"rank", "global_batch", "viol", "cost"}.
"""
import json
import os
import sys


def main():
    rank = int(sys.argv[1])
    nprocs = int(sys.argv[2])
    port = int(sys.argv[3])
    local_b = int(sys.argv[4])
    n_dev = int(sys.argv[5]) if len(sys.argv) > 5 else 4

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={n_dev}"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from qm_door_tpu.config import default_config
    from qm_door_tpu.models import aliengo_z1, kinematics, spatial
    from qm_door_tpu.ocp.gait import GAIT_LIBRARY, GaitSchedule
    from qm_door_tpu.ocp.problem import build_stage_data, make_ocp_config
    from qm_door_tpu.ocp.reference import TargetTrajectories
    from qm_door_tpu.parallel import mesh as pmesh
    from qm_door_tpu.parallel.batched import BatchedMpc
    from qm_door_tpu.solver.sqp import SqpSolver

    mesh = pmesh.multihost_mesh(
        coordinator_address=f"localhost:{port}",
        num_processes=nprocs,
        process_id=rank,
    )
    assert len(mesh.devices.ravel()) == nprocs * n_dev, mesh.devices.shape

    dtype = jnp.float32
    model = aliengo_z1(dtype=dtype)
    cfg = default_config()
    # small horizon: this validates the multi-process mesh plumbing, not
    # throughput (the full 67-node compile costs minutes on CPU x 2 procs)
    cfg.mpc.time_horizon = 0.12  # 8 nodes
    ocp = make_ocp_config(model, cfg, dtype=dtype)
    solver = SqpSolver(model, ocp, cfg)

    x0 = jnp.asarray(cfg.initial_state(), dtype=dtype)
    R_ee, p_ee = kinematics.ee_pose(model, x0[6:30])
    tstate = jnp.concatenate([x0, p_ee, spatial.rot_to_quat(R_ee)])
    targets = TargetTrajectories.create(
        jnp.array([0.0, 1e5], dtype=dtype), jnp.stack([tstate, tstate]),
        jnp.zeros((2, 30), dtype=dtype))
    sched = GaitSchedule()
    sched.insert_template(GAIT_LIBRARY["trot"], 0.0, 5.0)
    stage = build_stage_data(model, cfg, sched, targets, 0.0, dtype=dtype)

    # process-local scenario shard: every host draws ITS OWN slice (seeded by
    # rank) — the domain-randomization feed pattern of a real fleet
    rng = np.random.default_rng(100 + rank)
    x_local = jnp.asarray(
        np.asarray(x0)[None] + rng.normal(size=(local_b, 30)) * 0.02,
        dtype=dtype)

    mpc = BatchedMpc(solver, mesh=mesh, backend="bm_xla")
    # global arrays from per-process shards (jax.make_array_from_process_local_data)
    x_glob = pmesh.from_process_local(mesh, x_local)
    N = solver.n_intervals
    X_loc = jnp.tile(x_local[:, None, :], (1, N + 1, 1))
    U_loc = jnp.broadcast_to(stage.u_nom[:N], (local_b, N, 30)) + 0.0
    X = pmesh.from_process_local(mesh, X_loc)
    U = pmesh.from_process_local(mesh, U_loc)

    for _ in range(3):
        X, U, stats = mpc.step(stage, x_glob, X, U)
    jax.block_until_ready(X)
    cost, viol, alpha = stats
    # fleet statistics ARE the cross-host reduction (psum over DCN)
    viol_mean = float(jnp.mean(viol))
    cost_mean = float(jnp.mean(cost))
    print(json.dumps({
        "rank": rank,
        "global_batch": int(x_glob.shape[0]),
        "global_devices": len(mesh.devices.ravel()),
        "viol": viol_mean,
        "cost": cost_mean,
        "alpha_min": float(jnp.min(alpha)),
    }), flush=True)


if __name__ == "__main__":
    main()
