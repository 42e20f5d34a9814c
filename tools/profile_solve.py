#!/usr/bin/env python
"""Per-stage timing of one batched MPC solve on the attached device.

Times linearize / project / riccati(parallel+scan) / linesearch separately
(each jitted and block_until_ready'd) to direct kernel optimization.

Usage: QM_PROF_BATCH=256 python tools/profile_solve.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    jax.config.update("jax_default_matmul_precision", "highest")
    b = int(os.environ.get("QM_PROF_BATCH", "128"))
    from qm_door_tpu.config import default_config
    from qm_door_tpu.models import aliengo_z1, kinematics, spatial
    from qm_door_tpu.ocp.gait import GAIT_LIBRARY, GaitSchedule
    from qm_door_tpu.ocp.problem import build_stage_data, make_ocp_config
    from qm_door_tpu.ocp.reference import TargetTrajectories
    from qm_door_tpu.solver.sqp import SqpSolver, evaluate_trajectory, _linesearch
    from qm_door_tpu.solver.transcription import linearize_ocp, project_ocp
    from qm_door_tpu.solver.riccati import lqr_solve
    from qm_door_tpu.solver.parallel_riccati import parallel_riccati_backward

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
    xb = jnp.asarray(np.asarray(x0)[None] + rng.normal(size=(b, 30)) * 0.01, dtype=dtype)
    N = solver.n_intervals
    X = jnp.tile(xb[:, None, :], (1, N + 1, 1))
    U = jnp.broadcast_to(stage.u_nom[:N], (b, N, 30)) + 0.0

    dt = cfg.sqp.dt
    lin = jax.jit(jax.vmap(lambda Xk, Uk: linearize_ocp(model, ocp, stage, dt, Xk, Uk)))
    proj = jax.jit(jax.vmap(lambda lq, Uk: project_ocp(lq, stage, Uk)))
    ric_par = jax.jit(jax.vmap(parallel_riccati_backward))
    ric_scan = jax.jit(jax.vmap(lambda plq, dx0: lqr_solve(plq, dx0)))
    ev = jax.jit(jax.vmap(lambda Xk, Uk: evaluate_trajectory(model, ocp, stage, dt, Xk, Uk)))

    def timed(name, fn, *args, reps=5):
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.time()
        for _ in range(reps):
            out = fn(*args)
        jax.block_until_ready(out)
        ms = 1e3 * (time.time() - t0) / reps
        print(f"{name:>24}: {ms:9.2f} ms/step  ({1e3*ms/b:8.1f} us/solve)")
        return out

    print(f"batch={b} device={jax.devices()[0]}")
    lq = timed("linearize", lin, X, U)
    plq = timed("project", proj, lq, U)
    timed("riccati parallel", ric_par, plq)
    dx0 = xb - X[:, 0]
    timed("riccati scan+fwd", ric_scan, plq, dx0)
    timed("evaluate (1 alpha)", ev, X, U)

    # --- batch-major variants (the production path) ------------------------
    from qm_door_tpu.ocp import constraints as cons  # noqa: F401
    from qm_door_tpu.solver.transcription import project_ocp_batched
    from qm_door_tpu.solver.riccati import lqr_solve_batched

    flags = jnp.broadcast_to(stage.contact_flags[:N], (b, N, 4))
    for be in ("xla", "pallas"):
        pj = jax.jit(lambda lq, U, be=be: project_ocp_batched(
            lq, flags, U, backend=be))
        plq_bm = timed(f"project bm[{be}]", pj, lq, U)
        for unroll in (1, 8, 16):
            rs = jax.jit(lambda plq, dx0, be=be, u=unroll: lqr_solve_batched(
                plq, dx0, backend=be, unroll=u))
            timed(f"riccati bm[{be},u{unroll}]", rs, plq_bm, dx0)


if __name__ == "__main__":
    main()
