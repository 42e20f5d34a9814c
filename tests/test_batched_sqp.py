"""batched_sqp_iteration (early-exit linesearch, native batch) must match
vmap(sqp_iteration) (full alpha sweep) exactly: both select the largest
accepted alpha per scenario under the same filter rule."""
import jax
import jax.numpy as jnp
import numpy as np

from qm_door_tpu.ocp.gait import GAIT_LIBRARY, GaitSchedule
from qm_door_tpu.ocp.problem import build_stage_data
from qm_door_tpu.solver.batched_sqp import batched_sqp_iteration
from qm_door_tpu.solver.sqp import sqp_iteration

B = 3


def _setup(mpc_stack):
    model, cfg, ocp, solver, x0, targets = mpc_stack
    sched = GaitSchedule()
    sched.insert_template(GAIT_LIBRARY["trot"], 0.0, 5.0)
    stage = build_stage_data(model, cfg, sched, targets, 0.0)
    rng = np.random.default_rng(3)
    xb = jnp.asarray(np.asarray(x0)[None] + rng.normal(size=(B, 30)) * 0.03)
    N = solver.n_intervals
    X = jnp.tile(xb[:, None, :], (1, N + 1, 1))
    U = jnp.broadcast_to(stage.u_nom[:N], (B, N, 30)) + 0.0
    return model, cfg, ocp, solver, stage, xb, X, U


def test_batched_matches_vmapped(mpc_stack):
    model, cfg, ocp, solver, stage, xb, X, U = _setup(mpc_stack)

    Xv, Uv, statsv = jax.vmap(
        lambda x0, Xk, Uk: sqp_iteration(
            model, ocp, stage, solver.settings.dt, solver.settings, x0, Xk, Uk)
    )(xb, X, U)

    Xb, Ub, statsb = batched_sqp_iteration(
        model, ocp, stage, solver.settings.dt, solver.settings, xb, X, U,
        backend="xla")

    np.testing.assert_allclose(Xb, Xv, rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(Ub, Uv, rtol=1e-10, atol=1e-12)
    for a, b in zip(statsb, statsv):
        np.testing.assert_allclose(a, b, rtol=1e-10, atol=1e-12)
    # the accepted step must be a real move
    assert float(jnp.min(statsb[2])) > 0.0


def test_batch_major_backends_match_vmapped(mpc_stack):
    """bm_xla / bm_pallas (batch-major projection + Riccati, the TPU
    production path) match the per-scenario vmapped path."""
    model, cfg, ocp, solver, stage, xb, X, U = _setup(mpc_stack)

    Xr, Ur, statsr = batched_sqp_iteration(
        model, ocp, stage, solver.settings.dt, solver.settings, xb, X, U,
        backend="xla")

    for backend in ("bm_xla", "bm_pallas"):
        Xb, Ub, statsb = batched_sqp_iteration(
            model, ocp, stage, solver.settings.dt, solver.settings, xb, X, U,
            backend=backend)
        np.testing.assert_allclose(Xb, Xr, rtol=1e-8, atol=1e-9,
                                   err_msg=backend)
        np.testing.assert_allclose(Ub, Ur, rtol=1e-8, atol=1e-9,
                                   err_msg=backend)
        for a, b in zip(statsb, statsr):
            np.testing.assert_allclose(a, b, rtol=1e-8, atol=1e-9,
                                       err_msg=backend)


def test_batch_major_force_tracking(mpc_stack):
    """Batch-major path at nu = 36 (force-tracking): the off-grasp wrench is
    pinned to zero and the iterate matches the per-scenario path."""
    from qm_door_tpu.ocp.force import (
        make_ocp_config_ft, weight_compensating_input_ft, widen_stage_data,
    )

    model, cfg, _, solver, x0, targets = mpc_stack
    ocp_ft = make_ocp_config_ft(model, cfg)
    sched = GaitSchedule()
    stage30 = build_stage_data(model, cfg, sched, targets, 0.0)
    n_nodes = stage30.times.shape[0]
    grasp = (np.asarray(stage30.times) >= 0.3).astype(float)
    wref = np.tile(np.array([4.0, 0.0, -9.0, 0.0, 0.0, 0.4]), (n_nodes, 1))
    stage = widen_stage_data(stage30, grasp, wref)

    rng = np.random.default_rng(5)
    xb = jnp.asarray(np.asarray(x0)[None] + rng.normal(size=(B, 30)) * 0.02)
    N = solver.n_intervals
    X = jnp.tile(xb[:, None, :], (1, N + 1, 1))
    U = jnp.broadcast_to(
        jax.vmap(lambda f: weight_compensating_input_ft(model, f, dtype=x0.dtype)
                 )(stage.contact_flags[:N]),
        (B, N, 36)) + 0.0

    Xr, Ur, statsr = batched_sqp_iteration(
        model, ocp_ft, stage, solver.settings.dt, solver.settings, xb, X, U,
        backend="xla")
    Xb, Ub, statsb = batched_sqp_iteration(
        model, ocp_ft, stage, solver.settings.dt, solver.settings, xb, X, U,
        backend="bm_xla")
    np.testing.assert_allclose(Xb, Xr, rtol=1e-8, atol=1e-9)
    np.testing.assert_allclose(Ub, Ur, rtol=1e-8, atol=1e-9)
    for a, b in zip(statsb, statsr):
        np.testing.assert_allclose(a, b, rtol=1e-8, atol=1e-9)
    # off-grasp nodes keep exactly zero wrench through the update
    off = np.asarray(Ub)[:, grasp[:N] < 0.5, 30:36]
    np.testing.assert_allclose(off, 0.0, atol=1e-9)


def test_batched_second_iteration_converges(mpc_stack):
    model, cfg, ocp, solver, stage, xb, X, U = _setup(mpc_stack)
    Xb, Ub, stats = batched_sqp_iteration(
        model, ocp, stage, solver.settings.dt, solver.settings, xb, X, U,
        backend="xla")
    Xb2, Ub2, stats2 = batched_sqp_iteration(
        model, ocp, stage, solver.settings.dt, solver.settings, xb, Xb, Ub,
        backend="xla")
    assert float(jnp.max(stats2[1])) < float(jnp.max(stats[1]))
