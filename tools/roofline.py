#!/usr/bin/env python
"""Speed-of-light accounting for the batched MPC solve (BASELINE.md row 4).

For each solver stage (and the fused full step) this reports, side by side:

  - measured wall time per step / per solve,
  - XLA cost analysis: FLOPs and HBM bytes accessed of the compiled
    executable (post-fusion, i.e. what actually runs),
  - achieved TFLOP/s and GB/s,
  - the roofline bound  t_SoL = max(flops / peak_flops, bytes / peak_bw)
    against the v5e peaks below, and XLA's own `optimal_seconds`,
  - %SoL = t_SoL / t_measured — the number that says whether a stage is
    5% or 50% of the chip.

v5e (TPU v5 lite) peaks used for the bound (public "How to Scale Your
Model" / TPU spec numbers):

  HBM bandwidth       8.1e11 B/s   (819 GB/s)
  MXU bf16            1.97e14 FLOP/s
  MXU f32 (highest)   3.28e13 FLOP/s  (6-pass bf16 emulation; the solve
                      path pins jax_default_matmul_precision=highest)
  VPU f32             ~3.9e12 FLOP/s  (8x128 lanes x 4 ALUs x ~940 MHz)

XLA's flop counter does not split MXU vs VPU work, so the FLOP bound is
computed against the f32-matmul peak (optimistic for elementwise-heavy
stages like linearize — their true ceiling is the VPU row; both are
printed). The bandwidth bound needs no such caveat.

Usage: QM_PROF_BATCH=256 python tools/roofline.py [--json out.json]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

HBM_BW = 8.1e11            # B/s
MXU_F32 = 3.28e13          # FLOP/s (highest-precision matmul)
VPU_F32 = 3.9e12           # FLOP/s


def _cost(compiled):
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0)), float(
        ca.get("optimal_seconds", 0.0))


def bench_stage(name, fn, args, batch, reps=10):
    lowered = jax.jit(fn).lower(*args)
    compiled = lowered.compile()
    flops, bytes_, opt_s = _cost(compiled)
    out = compiled(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = compiled(*args)
    jax.block_until_ready(out)
    t = (time.time() - t0) / reps

    t_bw = bytes_ / HBM_BW
    t_mxu = flops / MXU_F32
    t_vpu = flops / VPU_F32
    t_sol = max(t_bw, t_mxu)
    row = {
        "stage": name,
        "us_per_step": 1e6 * t,
        "us_per_solve": 1e6 * t / batch,
        "gflops": flops / 1e9,
        "gbytes": bytes_ / 1e9,
        "achieved_tflops": flops / t / 1e12,
        "achieved_gbs": bytes_ / t / 1e9,
        "sol_us_bw": 1e6 * t_bw,
        "sol_us_mxu_f32": 1e6 * t_mxu,
        "sol_us_vpu_f32": 1e6 * t_vpu,
        "xla_optimal_us": 1e6 * opt_s,
        "pct_sol": 100.0 * t_sol / t,
        "pct_sol_vpu": 100.0 * max(t_bw, t_vpu) / t,
        "bound": "bandwidth" if t_bw > t_mxu else "flops",
    }
    print(
        f"{name:>22}: {row['us_per_step']:9.0f} us ({row['us_per_solve']:6.1f} us/solve)"
        f"  {row['gflops']:8.2f} GF {row['gbytes']:7.2f} GB"
        f"  -> {row['achieved_tflops']:5.2f} TF/s {row['achieved_gbs']:6.1f} GB/s"
        f"  SoL {row['pct_sol']:5.1f}% (mxu) {row['pct_sol_vpu']:5.1f}% (vpu)"
        f"  [{row['bound']}-bound]"
    )
    return out, row


def main():
    jax.config.update("jax_default_matmul_precision", "highest")
    b = int(os.environ.get("QM_PROF_BATCH", "256"))
    from qm_door_tpu.config import default_config
    from qm_door_tpu.models import aliengo_z1, kinematics, spatial
    from qm_door_tpu.ocp.gait import GAIT_LIBRARY, GaitSchedule
    from qm_door_tpu.ocp.problem import build_stage_data, make_ocp_config
    from qm_door_tpu.ocp.reference import TargetTrajectories
    from qm_door_tpu.solver.sqp import SqpSolver, evaluate_trajectory
    from qm_door_tpu.solver.transcription import linearize_ocp, project_ocp_batched
    from qm_door_tpu.solver.riccati import lqr_solve_batched

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
        jnp.array([0.0, 1e5], dtype=dtype), jnp.stack([tstate, tstate]),
        jnp.zeros((2, 30), dtype=dtype))
    sched = GaitSchedule()
    sched.insert_template(GAIT_LIBRARY["trot"], 0.0, 5.0)
    stage = build_stage_data(model, cfg, sched, targets, 0.0, dtype=dtype)

    rng = np.random.default_rng(0)
    xb = jnp.asarray(np.asarray(x0)[None] + rng.normal(size=(b, 30)) * 0.01,
                     dtype=dtype)
    N = solver.n_intervals
    X = jnp.tile(xb[:, None, :], (1, N + 1, 1))
    U = jnp.broadcast_to(stage.u_nom[:N], (b, N, 30)) + 0.0
    dt = cfg.sqp.dt
    flags = jnp.broadcast_to(stage.contact_flags[:N], (b, N, 4))
    dx0 = xb - X[:, 0]

    print(f"batch={b} device={jax.devices()[0]}")
    print(f"peaks: HBM {HBM_BW/1e9:.0f} GB/s, MXU f32(highest) "
          f"{MXU_F32/1e12:.1f} TF/s, VPU f32 {VPU_F32/1e12:.1f} TF/s")
    rows = []

    lq, r = bench_stage(
        "linearize",
        jax.vmap(lambda Xk, Uk: linearize_ocp(model, ocp, stage, dt, Xk, Uk)),
        (X, U), b)
    rows.append(r)
    plq, r = bench_stage(
        "project bm[pallas]",
        lambda lq, fl, Uk: project_ocp_batched(lq, fl, Uk, backend="pallas"),
        (lq, flags, U), b)
    rows.append(r)
    _, r = bench_stage(
        "riccati bm[pallas]",
        lambda plq, dx0: lqr_solve_batched(plq, dx0, backend="pallas", unroll=1),
        (plq, dx0), b)
    rows.append(r)
    _, r = bench_stage(
        "evaluate (1 alpha)",
        jax.vmap(lambda Xk, Uk: evaluate_trajectory(model, ocp, stage, dt, Xk, Uk)),
        (X, U), b)
    rows.append(r)

    # full fused SQP step (the bench.py graph): the sum of the stages above
    # misses inter-stage fusion; this is the end-to-end truth.
    from qm_door_tpu.solver.batched_sqp import batched_sqp_iteration

    backend = "bm_pallas" if jax.default_backend() == "tpu" else "bm_xla"
    _, r = bench_stage(
        "full sqp step",
        lambda xs, Xs, Us: batched_sqp_iteration(
            model, ocp, stage, dt, solver.settings, xs, Xs, Us,
            backend=backend),
        (xb, X, U), b)
    rows.append(r)

    out = os.environ.get("QM_ROOFLINE_JSON")
    if "--json" in sys.argv:
        out = sys.argv[sys.argv.index("--json") + 1]
    if out:
        with open(out, "w") as f:
            json.dump(rows, f, indent=1)
        print(f"wrote {out}")


if __name__ == "__main__":
    main()
