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
    # batch sweep (analytic_bf16 linearize, v5e, r5): 256 -> 6872,
    # 384 -> 6991, 512 -> 6709 solves/s; the knee moved 256 -> 384 when the
    # analytic linearize shrank the per-solve working set
    b = int(os.environ.get("QM_BENCH_BATCH", "384"))
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
    # Linesearch candidate count. 4 matches OCS2's grid; 2 (serving default)
    # measured the SAME converged violation (1.493e-6 vs 1.485e-6, 20 reps)
    # at +2.3% throughput — at the warm-started fixed point alpha=1 is
    # always accepted and the extra candidates are pure bandwidth. 1 is
    # WORSE on both axes (no fallback: rejected steps poison the iterate,
    # violation 6e-4 and slower) — keep the one fallback candidate.
    cfg.sqp.linesearch_steps = int(os.environ.get("QM_BENCH_LS", "2"))
    cfg.sqp.riccati_unroll = int(os.environ.get("QM_BENCH_UNROLL", "1"))
    # Analytic/geometric linearization with bf16 sweeps is the TPU serving
    # default (closed-form momentum-rate/EE rows + 6-cotangent reverse CMM
    # pass; exact f32 defects; see config.SqpSettings.lin_tangents):
    # r5 batch-384 sweep measured 6991 (analytic_bf16) vs 6648 (bf16 AD,
    # batch 256) vs 6330 (analytic f32) solves/s, mean violation 8.8e-7.
    # QM_BENCH_TANGENTS=bf16|f32|analytic reverts. Watch mean_violation.
    cfg.sqp.lin_tangents = os.environ.get("QM_BENCH_TANGENTS", "analytic_bf16")
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

    # --- scaling report block (BASELINE.md "report 1 chip / 1 host / N hosts")
    # Real multi-chip hardware is absent here; the standing artifact is
    # (a) the measured 1-chip number above, (b) a weak-scaling run of the
    # SAME sharded BatchedMpc path on a virtual 8-device CPU mesh
    # (tools/scaling_probe.py, subprocess — the TPU process cannot host the
    # CPU mesh), and (c) a bandwidth-ratio projection to the v5p-16 target
    # machine. The hardware numbers drop into this block the moment chips
    # exist. QM_BENCH_SCALING=0 skips the probe.
    scaling = {
        "one_chip_solves_per_s": round(solves_per_s, 1),
        "one_chip_device": str(jax.devices()[0]),
        "multi_host_dcn": "hardware-unavailable (2-process DCN correctness: tests/test_multihost.py)",
    }
    if os.environ.get("QM_BENCH_SCALING", "1") == "1":
        import subprocess

        try:
            env = dict(os.environ, JAX_PLATFORMS="cpu")
            out = subprocess.run(
                [sys.executable, os.path.join(os.path.dirname(__file__),
                                              "tools", "scaling_probe.py")],
                capture_output=True, text=True, timeout=900, env=env,
            )
            scaling["weak_scaling_cpu_mesh"] = json.loads(
                out.stdout.strip().splitlines()[-1])
        except Exception as e:  # noqa: BLE001 - report, never fail the bench
            scaling["weak_scaling_cpu_mesh"] = {"error": repr(e)[:200]}
    # v5p-16 projection: the SQP step is HBM-bandwidth-bound at ~937 GB/s
    # achieved on this v5e (docs/PERF.md roofline), so per-chip throughput
    # projects with the HBM ratio (v5p 2765 / v5e 810 GB/s nominal); the
    # v5p-16 slice has 8 chips; 0.85 = BASELINE.md's multi-host efficiency
    # floor applied as the scaling discount.
    hbm_ratio = 2765.0 / 810.0
    scaling["v5p16_projection_solves_per_s"] = round(
        solves_per_s * hbm_ratio * 8 * 0.85)
    scaling["v5p16_projection_basis"] = (
        "HBM-bound step: v5e measured x (2765/810 GB/s) x 8 chips x 0.85")

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
        "scaling": scaling,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
