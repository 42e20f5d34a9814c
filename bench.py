#!/usr/bin/env python
"""Benchmark: batched whole-body NMPC throughput on the attached TPU chip.

Prints ONE JSON line:
  {"metric": "mpc_solves_per_s", "value": N, "unit": "solves/s",
   "vs_baseline": N / 10000}

baseline = the driver's north-star target of 10k batched MPC solves/s
(BASELINE.md; the reference's own budget is 100 solves/s on a desktop CPU —
one 10 ms SQP solve per cycle at 100 Hz, task.info mpc/sqp settings).

One "solve" = one full SQP/MPC iteration of the combined AlienGo+Z1 problem:
RK2 linearization of the 30-state/30-input centroidal OCP over the 1 s /
67-node horizon, constraint projection, Riccati sweep, parallel filter
linesearch — identical math to a 100 Hz re-solve tick.
"""
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def _device_watchdog(timeout_s=240.0):
    """Fail fast and legibly if the tunneled device is unreachable (a
    wedged tunnel otherwise hangs the first compile indefinitely —
    observed after repeated large-batch device faults)."""
    import threading

    done = threading.Event()
    err = []

    def probe():
        try:
            y = (jnp.ones((128, 128)) @ jnp.ones((128, 128))).sum()
            jax.block_until_ready(y)
        except Exception as e:  # noqa: BLE001 - report any device error
            err.append(repr(e))
        done.set()

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    if not done.wait(timeout_s) or err:
        reason = err[0] if err else f"device probe hung > {timeout_s:.0f}s"
        print(json.dumps({
            "metric": "mpc_solves_per_s", "value": None, "unit": "solves/s",
            "error": f"TPU unreachable: {reason}",
        }), flush=True)
        # os._exit: a hung device thread can block normal interpreter
        # shutdown indefinitely
        os._exit(1)


def main():
    # Solver linear algebra needs true f32 matmuls; the TPU default (bf16
    # operands) destroys the Riccati/Cholesky conditioning.
    jax.config.update("jax_default_matmul_precision", "highest")
    _device_watchdog()
    # Persistent compile cache (single-writer flock; the CppAD codegen-cache
    # role, task.info:13-15) — warm starts skip the 60-130 s XLA compile.
    from qm_door_tpu.utils.compile_cache import enable_persistent_cache

    cache_on = enable_persistent_cache()
    # batch sweep (bf16 tangents, v5e): 256 -> 6240, 512 -> 5875,
    # 1024 -> 5213 solves/s; 256 is the single-chip throughput knee
    b = int(os.environ.get("QM_BENCH_BATCH", "256"))
    reps = int(os.environ.get("QM_BENCH_REPS", "20"))

    from qm_door_tpu.config import default_config, quad_only_config
    from qm_door_tpu.models import aliengo_z1, kinematics, spatial
    from qm_door_tpu.ocp.gait import GAIT_LIBRARY, GaitSchedule
    from qm_door_tpu.ocp.problem import build_stage_data, make_ocp_config
    from qm_door_tpu.ocp.reference import TargetTrajectories
    from qm_door_tpu.parallel.batched import BatchedMpc
    from qm_door_tpu.solver.sqp import SqpSolver

    dtype = jnp.float32
    model = aliengo_z1(dtype=dtype)
    # QM_BENCH_QUAD_ONLY=1: BASELINE config #1 (arm welded) bench row
    quad_only = os.environ.get("QM_BENCH_QUAD_ONLY", "0") == "1"
    cfg = quad_only_config() if quad_only else default_config()
    # 0 = linearize all 67 nodes at once: the 24-tangent + elementwise
    # small-matmul pipeline fits HBM unchunked now, and lax.map chunking
    # (serialized fused mega-kernels) measured 4x slower after the rewrite
    cfg.sqp.lin_chunk = int(os.environ.get("QM_BENCH_LIN_CHUNK", "0"))
    # Linesearch candidate count (semantics knob — 4 matches OCS2's grid;
    # 1 bounds the early-exit ceiling for perf triage).
    cfg.sqp.linesearch_steps = int(os.environ.get("QM_BENCH_LS", "4"))
    cfg.sqp.riccati_unroll = int(os.environ.get("QM_BENCH_UNROLL", "1"))
    # bf16 AD tangent sweep is the TPU serving default (exact f32 defects,
    # bf16 Jacobians; see config.SqpSettings.lin_tangents): 4509 -> 5875
    # solves/s at batch 512 with mean violation IMPROVED 1.55e-5 -> 8.1e-7.
    # QM_BENCH_TANGENTS=f32 reverts. Watch mean_violation for regressions.
    cfg.sqp.lin_tangents = os.environ.get("QM_BENCH_TANGENTS", "bf16")
    backend = os.environ.get("QM_BENCH_BACKEND", "auto")
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

    # domain-randomized initial states (small pose/momentum perturbations)
    rng = np.random.default_rng(0)
    perturb = rng.normal(size=(b, 30)) * 0.02
    x_batch = jnp.asarray(np.asarray(x0)[None, :] + perturb, dtype=dtype)

    mpc = BatchedMpc(solver, backend=backend)
    X, U = mpc.cold_start(stage, x_batch)

    # warm-up / compile
    print(f"compiling batched step (batch={b}) ...", file=sys.stderr, flush=True)
    t0 = time.time()
    X, U, stats = mpc.step(stage, x_batch, X, U)
    jax.block_until_ready(X)
    compile_s = time.time() - t0
    print(f"compiled in {compile_s:.1f}s; running {reps} reps", file=sys.stderr, flush=True)

    t0 = time.time()
    for i in range(reps):
        X, U, stats = mpc.step(stage, x_batch, X, U)
        if i == 0:
            jax.block_until_ready(X)
            print(f"first step {time.time()-t0:.2f}s", file=sys.stderr, flush=True)
    jax.block_until_ready(X)
    elapsed = time.time() - t0
    viol = float(jnp.mean(stats[1]))
    print(f"mean violation after {reps} reps: {viol:.2e}", file=sys.stderr, flush=True)

    solves_per_s = b * reps / elapsed
    result = {
        "metric": "mpc_solves_per_s",
        "value": round(solves_per_s, 1),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_s / 10000.0, 4),
        "batch": b,
        "reps": reps,
        "per_solve_us": round(1e6 * elapsed / (b * reps), 2),
        "compile_s": round(compile_s, 1),
        "compile_cache": cache_on,
        "backend": mpc.backend,
        "config": "quad_only" if quad_only else "combined",
        "mean_violation": viol,
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
