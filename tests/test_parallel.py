"""Scenario-parallel batched MPC over the 8-device virtual CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qm_door_tpu.config import default_config
from qm_door_tpu.ocp.gait import GAIT_LIBRARY, GaitSchedule
from qm_door_tpu.ocp.problem import build_stage_data, make_ocp_config
from qm_door_tpu.ocp.reference import TargetTrajectories
from qm_door_tpu.parallel.batched import BatchedMpc
from qm_door_tpu.parallel.mesh import scenario_mesh, shard_batch
from qm_door_tpu.solver.sqp import SqpSolver


@pytest.fixture(scope="module")
def small_setup():
    from qm_door_tpu.models import aliengo_z1, kinematics, spatial

    model = aliengo_z1()
    cfg = default_config()
    cfg.mpc.time_horizon = 8 * cfg.sqp.dt  # tiny horizon for test speed
    ocp = make_ocp_config(model, cfg)
    solver = SqpSolver(model, ocp, cfg)
    x0 = jnp.asarray(cfg.initial_state())
    R_ee, p_ee = kinematics.ee_pose(model, x0[6:30])
    quat = spatial.rot_to_quat(R_ee)
    tstate = jnp.concatenate([x0, p_ee, quat])
    targets = TargetTrajectories.create(
        jnp.array([0.0, 1e5]), jnp.stack([tstate, tstate]), jnp.zeros((2, 30))
    )
    sched = GaitSchedule()
    sched.insert_template(GAIT_LIBRARY["trot"], 0.0, 5.0)
    stage = build_stage_data(
        model, cfg, sched, targets, 0.0, horizon=cfg.mpc.time_horizon
    )
    return model, cfg, ocp, solver, stage, x0


def test_eight_device_mesh_available():
    assert len(jax.devices()) == 8


def test_sharded_batch_matches_single_device(small_setup, rng):
    model, cfg, ocp, solver, stage, x0 = small_setup
    b = 16
    xb = jnp.asarray(np.asarray(x0)[None] + rng.normal(size=(b, 30)) * 0.01)

    # unsharded reference
    mpc0 = BatchedMpc(solver)
    X0, U0 = mpc0.cold_start(stage, xb)
    Xr, Ur, stats_r = mpc0.step(stage, xb, X0, U0)

    # sharded over the 8-device mesh
    mesh = scenario_mesh(8)
    mpc = BatchedMpc(solver, mesh=mesh)
    xb_s = shard_batch(xb, mesh)
    X0_s = shard_batch(X0, mesh)
    U0_s = shard_batch(U0, mesh)
    Xs, Us, stats_s = mpc.step(stage, xb_s, X0_s, U0_s)

    np.testing.assert_allclose(np.asarray(Xs), np.asarray(Xr), atol=1e-8)
    np.testing.assert_allclose(np.asarray(Us), np.asarray(Ur), atol=1e-8)
    # each scenario actually sharded
    assert len(Xs.sharding.device_set) == 8
    # all scenarios converged independently
    assert np.isfinite(np.asarray(stats_s[0])).all()


def test_contact_timing_sweep(mpc_stack):
    """BASELINE config #3 axis: a batched sweep over gait contact timings —
    per-scenario stage data (trot cycle scaled 0.6x-1.4x), all scenarios
    advanced in one vmapped solve; every timing converges."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from qm_door_tpu.ocp.gait import GAIT_LIBRARY, GaitSchedule, ModeSequenceTemplate
    from qm_door_tpu.ocp.problem import build_stage_data
    from qm_door_tpu.parallel.batched import BatchedMpc

    model, cfg, ocp, solver, x0, targets = mpc_stack
    trot = GAIT_LIBRARY["trot"]
    scales = np.linspace(0.6, 1.4, 8)
    stages = []
    for s in scales:
        tpl = ModeSequenceTemplate(
            list(trot.modes), [float(t) * float(s) for t in trot.switching_times]
        )
        sched = GaitSchedule()
        sched.insert_template(tpl, 0.0, 10.0)
        stages.append(build_stage_data(model, cfg, sched, targets, 0.0))
    stage_b = jax.tree.map(lambda *xs: jnp.stack(xs), *stages)

    B = len(scales)
    x0b = jnp.tile(x0[None], (B, 1))
    mpc = BatchedMpc(solver, shared_stage=False)
    X, U = mpc.cold_start(stage_b, x0b)
    for _ in range(8):
        X, U, (cost, viol, alpha) = mpc.step(stage_b, x0b, X, U)
    cost, viol = np.asarray(cost), np.asarray(viol)
    assert np.isfinite(cost).all() and np.isfinite(viol).all()
    assert (viol < 1e-3).all(), viol
    # different contact timings -> genuinely different problems/solutions
    assert np.std(cost) > 1e-3
