#!/usr/bin/env python
"""Sub-stage timing of the fused linearization (the #1 cost in the solve).

Times, at (batch x 67 nodes): the stage-1 primal alone, the 24-tangent
stage-1 AD pipeline, the stage-2 pipeline, quadratize, and a bf16-tangent
variant (tangent traffic halved; primal kept f32) — to direct the next
round of linearize optimization.

Usage: QM_PROF_BATCH=512 python tools/profile_linearize.py
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
    b = int(os.environ.get("QM_PROF_BATCH", "256"))
    from qm_door_tpu.config import default_config
    from qm_door_tpu.models import aliengo_z1, centroidal, kinematics, spatial
    from qm_door_tpu.ocp import constraints as cons
    from qm_door_tpu.ocp.gait import GAIT_LIBRARY, GaitSchedule
    from qm_door_tpu.ocp.problem import (
        _ee_error, build_stage_data, make_ocp_config, quadratize_stage,
    )
    from qm_door_tpu.ocp.reference import TargetTrajectories
    from qm_door_tpu.solver.sqp import SqpSolver
    from qm_door_tpu.solver.transcription import linearize_ocp

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

    def timed(name, fn, *args, reps=5):
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.time()
        for _ in range(reps):
            out = fn(*args)
        jax.block_until_ready(out)
        ms = 1e3 * (time.time() - t0) / reps
        print(f"{name:>28}: {ms:9.2f} ms/step  ({1e3*ms/b:8.1f} us/solve)")
        return out

    print(f"batch={b} nodes={N} device={jax.devices()[0]}")

    full = jax.jit(jax.vmap(
        lambda Xk, Uk: linearize_ocp(model, ocp, stage, dt, Xk, Uk)))
    timed("linearize full", full, X, U)

    ks = jnp.arange(N)

    def node_stage1(k, x, u, tangent_dtype=None):
        h_bar, q_bar = x[0:6], x[6:30]
        flags = stage.contact_flags[k]
        zref = stage.z_vel_ref[k]

        def s1(q_):
            x_ = jnp.concatenate([h_bar.astype(q_.dtype), q_])
            f1 = centroidal.flow_map_any(model, x_, u.astype(q_.dtype))
            g = cons.velocity_constraint(
                model, x_, u.astype(q_.dtype), flags, zref)
            e = _ee_error(model, ocp, x_, stage.ee_pos_ref[k],
                          stage.ee_quat_ref[k])
            return jnp.concatenate([f1, g, e])

        if tangent_dtype is None:
            out1, jvp1 = jax.linearize(s1, q_bar)
            J1 = jax.vmap(jvp1)(jnp.eye(24, dtype=x.dtype)).T
            return out1, J1
        # bf16 tangents: primal recomputed in f32 separately
        out1 = s1(q_bar)
        _, jvp1 = jax.linearize(s1, q_bar.astype(tangent_dtype))
        J1 = jax.vmap(jvp1)(jnp.eye(24, dtype=tangent_dtype)).T
        return out1, J1.astype(x.dtype)

    prim = jax.jit(jax.vmap(lambda Xk, Uk: jax.vmap(
        lambda k, x, u: node_stage1(k, x, u)[0])(ks, Xk[:-1], Uk)))
    timed("stage1 primal only", prim, X, U)

    tang = jax.jit(jax.vmap(lambda Xk, Uk: jax.vmap(
        lambda k, x, u: node_stage1(k, x, u))(ks, Xk[:-1], Uk)))
    timed("stage1 primal+24tan f32", tang, X, U)

    tang16 = jax.jit(jax.vmap(lambda Xk, Uk: jax.vmap(
        lambda k, x, u: node_stage1(k, x, u, jnp.bfloat16))(ks, Xk[:-1], Uk)))
    timed("stage1 primal+24tan bf16", tang16, X, U)

    quad = jax.jit(jax.vmap(lambda Xk, Uk: jax.vmap(
        lambda k, x, u: quadratize_stage(model, ocp, stage, k, x, u)
    )(ks, Xk[:-1], Uk)))
    timed("quadratize", quad, X, U)

    from qm_door_tpu.solver.transcription import (
        _flow_force_cols, _momentum_velocity_coeffs,
    )

    mvc = jax.jit(jax.vmap(jax.vmap(
        lambda x: _momentum_velocity_coeffs(
            model, centroidal.pinocchio_q(x), x.dtype))))
    timed("momentum_velocity_coeffs", mvc, X[:, :-1])

    ffc = jax.jit(jax.vmap(jax.vmap(lambda x: _flow_force_cols(model, x))))
    timed("flow_force_cols", ffc, X[:, :-1])

    def node_stage2(x, u):
        def s2(q_):
            return centroidal.flow_map_any(
                model, jnp.concatenate([x[0:6], q_]), u)

        f2, jvp2 = jax.linearize(s2, x[6:30])
        return f2, jax.vmap(jvp2)(jnp.eye(24, dtype=x.dtype)).T

    st2 = jax.jit(jax.vmap(lambda Xk, Uk: jax.vmap(node_stage2)(Xk[:-1], Uk)))
    timed("stage2 flow primal+24tan", st2, X, U)

    jfeet = jax.jit(jax.vmap(jax.vmap(lambda x: kinematics.frame_jacobians(
        model, centroidal.pinocchio_q(x), model.contact_frame_ids))))
    timed("frame_jacobians (feet)", jfeet, X[:, :-1])


if __name__ == "__main__":
    main()
