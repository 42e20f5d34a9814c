#!/usr/bin/env python
"""Batched closed-loop rollout throughput on the attached TPU.

The domain-randomized MPC-as-policy workload (BASELINE config #5): B
scenarios x T MPC cycles of the full stack on device. Reports cycles/s,
scenario-seconds of simulation per wall second, and the survivor count.

Usage: QM_ROLLOUT_BATCH=64 QM_ROLLOUT_CYCLES=20 python tools/rollout_bench.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    # honor JAX_PLATFORMS=cpu for the virtual-device mesh runs: the image's
    # sitecustomize imports jax and pins the axon (TPU) platform at
    # interpreter start, so the env var alone is not enough (same override
    # as tests/conftest.py)
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")
    b = int(os.environ.get("QM_ROLLOUT_BATCH", "64"))
    cycles = int(os.environ.get("QM_ROLLOUT_CYCLES", "20"))
    # QM_ROLLOUT_MESH=N shards the scenario axis over an N-device mesh
    # (BASELINE config #5's serving shape; on this box: the 8-virtual-device
    # CPU mesh via XLA_FLAGS=--xla_force_host_platform_device_count=8
    # JAX_PLATFORMS=cpu). GSPMD propagates the input sharding through the
    # jitted rollout — per-scenario work stays device-local, no collectives.
    n_mesh = int(os.environ.get("QM_ROLLOUT_MESH", "0"))

    from qm_door_tpu.config import default_config
    from qm_door_tpu.models import aliengo_z1, centroidal, kinematics, spatial
    from qm_door_tpu.ocp.gait import GAIT_LIBRARY, GaitSchedule
    from qm_door_tpu.ocp.problem import make_ocp_config
    from qm_door_tpu.ocp.reference import TargetTrajectories
    from qm_door_tpu.sim.batched_rollout import BatchedClosedLoop, stack_stages
    from qm_door_tpu.sim.sim import SimConfig
    from qm_door_tpu.solver.sqp import SqpSolver

    dtype = jnp.float32
    model = aliengo_z1(dtype=dtype)
    cfg = default_config()
    cfg.sqp.lin_chunk = 0
    ocp = make_ocp_config(model, cfg, dtype=dtype)
    solver = SqpSolver(model, ocp, cfg)

    x0 = jnp.asarray(cfg.initial_state(), dtype=dtype)
    R_ee, p_ee = kinematics.ee_pose(model, x0[6:30])
    quat = spatial.rot_to_quat(R_ee)
    tstate = jnp.concatenate([x0, p_ee, quat])
    targets = TargetTrajectories.create(
        jnp.array([0.0, 1e5], dtype=dtype), jnp.stack([tstate, tstate]),
        jnp.zeros((2, 30), dtype=dtype))
    sched = GaitSchedule()
    sched.insert_template(GAIT_LIBRARY["trot"], 0.0, 60.0)

    sim_cfg = SimConfig()
    mpc_decim = 10
    # cap the solve stage's HBM workspace at the proven batch-1024 level
    # (un-chunked 2048+ faults the v5e; the rollout is sim/WBC-dominated so
    # chunking the solve is ~free) — override with QM_ROLLOUT_SOLVE_CHUNK
    chunk_default = 1024 if b > 1024 else 0
    solve_chunk = int(os.environ.get("QM_ROLLOUT_SOLVE_CHUNK", chunk_default))
    cycle_chunk = int(os.environ.get("QM_ROLLOUT_CYCLE_CHUNK", chunk_default))
    loop = BatchedClosedLoop(model, cfg, solver, sim_cfg, 2, mpc_decim,
                             solve_chunk=solve_chunk, cycle_chunk=cycle_chunk)
    stages = stack_stages(model, cfg, sched, targets, 0.0, cycles,
                          mpc_decim * sim_cfg.dt, dtype)

    rng = np.random.default_rng(0)
    q0 = centroidal.pinocchio_q(x0)
    feet_z = float(jnp.mean(kinematics.contact_positions(model, q0)[:, 2]))
    q0 = q0.at[2].add(-feet_z)
    q0b = jnp.asarray(
        np.asarray(q0)[None] + rng.normal(size=(b, 24)) * 0.01, dtype=dtype
    )

    stage0 = jax.tree.map(lambda x: x[0], stages)
    carry = loop.init_carry(stage0, q0b)
    if n_mesh:
        from qm_door_tpu.parallel.mesh import replicate, scenario_mesh, shard_batch

        assert b % n_mesh == 0, (b, n_mesh)
        mesh = scenario_mesh(n_devices=n_mesh)
        stages = replicate(stages, mesh)
        carry = shard_batch(carry, mesh)

    # domain randomization (BASELINE config #5): per-scenario payload
    # (persistent -z base force, 0-60 N ~ 0-6 kg) and a lateral push burst
    # (0-60 N for cycles 5-7, random heading)
    wr = np.zeros((cycles, b, 6), dtype=np.float32)
    payload = rng.uniform(0.0, 60.0, size=b)
    wr[:, :, 2] -= payload[None, :]
    heading = rng.uniform(0.0, 2 * np.pi, size=b)
    push = rng.uniform(0.0, 60.0, size=b)
    lo, hi = min(5, cycles - 1), min(8, cycles)
    wr[lo:hi, :, 0] += (push * np.cos(heading))[None, :]
    wr[lo:hi, :, 1] += (push * np.sin(heading))[None, :]
    wrenches = jnp.asarray(wr, dtype=dtype)
    if n_mesh:
        from jax.sharding import NamedSharding, PartitionSpec as P

        wrenches = jax.device_put(
            wrenches, NamedSharding(mesh, P(None, "scenario")))

    if os.environ.get("QM_ROLLOUT_MEMSTATS") == "1":
        # exact compiled-footprint report (XLA memory analysis): where the
        # HBM goes at large batch, without having to survive a run
        lowered = loop._run.lower(stages, carry, wrenches)
        mem = lowered.compile().memory_analysis()
        print(json.dumps({
            "batch": b, "solve_chunk": solve_chunk, "cycle_chunk": cycle_chunk,
            "argument_mb": round(mem.argument_size_in_bytes / 2**20, 1),
            "output_mb": round(mem.output_size_in_bytes / 2**20, 1),
            "temp_mb": round(mem.temp_size_in_bytes / 2**20, 1),
            "generated_code_mb": round(
                mem.generated_code_size_in_bytes / 2**20, 1),
        }), flush=True)

    print("compiling batched rollout ...", file=sys.stderr, flush=True)
    t0 = time.time()
    carry_out, log = loop.run(stages, carry, wrenches)
    jax.block_until_ready(carry_out.sim.q)
    compile_s = time.time() - t0
    print(f"compiled+ran in {compile_s:.1f}s", file=sys.stderr, flush=True)

    # Free the warm-up run's outputs BEFORE the timed run: holding them
    # doubles peak HBM (first-run log + second-run workspace) and at batch
    # >= 2048 that overcommit surfaces as an opaque 'TPU device error' on
    # the next dispatch rather than a clean OOM.
    del carry_out, log

    t0 = time.time()
    carry_out, log = loop.run(stages, carry, wrenches)
    jax.block_until_ready(carry_out.sim.q)
    elapsed = time.time() - t0

    sim_seconds = b * cycles * mpc_decim * sim_cfg.dt
    alive = int(np.asarray(carry_out.alive).sum())
    print(json.dumps({
        "metric": "closed_loop_scenario_sim_s_per_wall_s",
        "value": round(sim_seconds / elapsed, 2),
        "unit": "sim-s/s",
        "batch": b,
        "cycles": cycles,
        "wall_s": round(elapsed, 2),
        "mpc_solves_per_s": round(b * cycles / elapsed, 1),
        "alive": alive,
        "compile_s": round(compile_s, 1),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
