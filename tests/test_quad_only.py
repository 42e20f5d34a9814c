"""Quadruped-only (arm-welded) variant — BASELINE config #1.

The reference runs AlienGo-only by building the model with the leg-only
joint set (ModelSettings.h:147-153). TPU-first, the variant is a MASK on the
fixed-shape 30/30 problem: arm velocity inputs pinned to zero through the
equality projection, EE tracking cost off (quad_only_config()).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qm_door_tpu.config import default_config, quad_only_config
from qm_door_tpu.ocp import constraints as cons
from qm_door_tpu.ocp.gait import GAIT_LIBRARY, GaitSchedule
from qm_door_tpu.ocp.problem import build_stage_data, make_ocp_config
from qm_door_tpu.ocp.reference import TargetTrajectories
from qm_door_tpu.solver import transcription as tr
from qm_door_tpu.solver.sqp import SqpSolver


@pytest.fixture(scope="module")
def quad_setup(model):
    cfg = quad_only_config()
    ocp = make_ocp_config(model, cfg)
    x0 = jnp.asarray(cfg.initial_state())
    tstate = jnp.concatenate([x0, jnp.zeros(3), jnp.array([0.0, 0.0, 0.0, 1.0])])
    targets = TargetTrajectories.create(
        jnp.array([0.0, 1e5]), jnp.stack([tstate, tstate]), jnp.zeros((2, 30))
    )
    return cfg, ocp, x0, targets


def _trot_stage(model, cfg, targets, horizon=0.12):
    sched = GaitSchedule()
    sched.insert_template(GAIT_LIBRARY["trot"], 0.0, 10.0)
    return sched, build_stage_data(model, cfg, sched, targets, 0.0, horizon=horizon)


def test_arm_lock_projection(model, quad_setup, rng):
    """The locked projection pins du_arm = -u_arm and still satisfies the
    active foot-velocity equality rows exactly."""
    cfg, ocp, x0, targets = quad_setup
    _, stage = _trot_stage(model, cfg, targets)
    N = stage.times.shape[0] - 1
    dt = cfg.sqp.dt

    X = jnp.tile(x0[None], (N + 1, 1)) + 0.01 * jnp.asarray(
        rng.normal(size=(N + 1, 30)))
    U = stage.u_nom[:N] + 0.1 * jnp.asarray(rng.normal(size=(N, 30)))

    lq = tr.linearize_ocp(model, ocp, stage, dt, X, U)
    plq = tr.project_ocp(lq, stage, U, arm_locked=True)

    dx = jnp.asarray(rng.normal(size=30))
    u_red = jnp.asarray(rng.normal(size=plq.Pu.shape[-1]))
    for k in (0, N // 2, N - 1):
        du = plq.p[k] + plq.Pu[k] @ u_red + plq.Px[k] @ dx
        # arm velocity inputs pinned: u + du has exactly zero arm velocity
        np.testing.assert_allclose(
            np.asarray(U[k, 24:30] + du[24:30]), 0.0, atol=1e-12)
        # active velocity rows satisfied
        active = np.asarray(cons.velocity_row_mask(stage.contact_flags[k]))
        g = np.asarray(lq.g0[k] + lq.Gx[k] @ dx + lq.Gv[k] @ du[12:30])
        np.testing.assert_allclose(g * active, 0.0, atol=1e-8)


def test_arm_lock_batched_matches_per_node(model, quad_setup, rng):
    """project_ocp_batched(arm_locked) == vmap of the per-node projector."""
    cfg, ocp, x0, targets = quad_setup
    _, stage = _trot_stage(model, cfg, targets)
    N = stage.times.shape[0] - 1
    dt = cfg.sqp.dt
    B = 3

    X = jnp.tile(x0[None, None], (B, N + 1, 1)) + 0.01 * jnp.asarray(
        rng.normal(size=(B, N + 1, 30)))
    U = jnp.tile(stage.u_nom[None, :N], (B, 1, 1)) + 0.1 * jnp.asarray(
        rng.normal(size=(B, N, 30)))

    lq = jax.vmap(lambda Xk, Uk: tr.linearize_ocp(model, ocp, stage, dt, Xk, Uk))(X, U)
    flags = jnp.broadcast_to(stage.contact_flags[:N], (B, N, 4))
    plq_b = tr.project_ocp_batched(lq, flags, U, arm_locked=True)
    plq_v = jax.vmap(
        lambda lqk, Uk: tr.project_ocp(lqk, stage, Uk, arm_locked=True)
    )(lq, U)
    for name in ("A", "B", "d", "lx", "lu", "lxx", "luu", "lux", "p"):
        np.testing.assert_allclose(
            np.asarray(getattr(plq_b, name)), np.asarray(getattr(plq_v, name)),
            atol=1e-9, err_msg=name)
    # the batched path carries the STRUCTURED recovery blocks (P, Px_v,
    # force_mask) instead of materializing dense Pu/Px (transcription.
    # _apply_projection_structured); compare against the per-node dense form
    Pu_d = np.asarray(plq_v.Pu)
    Px_d = np.asarray(plq_v.Px)
    fm = np.asarray(plq_b.force_mask)
    np.testing.assert_allclose(
        Pu_d[..., 0:12, 0:12],
        fm[..., None] * np.eye(12), atol=1e-9, err_msg="Pu force block")
    np.testing.assert_allclose(
        Pu_d[..., 12:30, 12:30], np.asarray(plq_b.P), atol=1e-9,
        err_msg="Pu joint-velocity block")
    np.testing.assert_allclose(
        Pu_d[..., 0:12, 12:30], 0.0, atol=1e-9, err_msg="Pu off-diag")
    np.testing.assert_allclose(
        Pu_d[..., 12:30, 0:12], 0.0, atol=1e-9, err_msg="Pu off-diag")
    np.testing.assert_allclose(
        Px_d[..., 12:30, :], np.asarray(plq_b.Px_v), atol=1e-9, err_msg="Px_v")
    np.testing.assert_allclose(
        Px_d[..., 0:12, :], 0.0, atol=1e-9, err_msg="Px force rows")


def test_quad_only_trot_solve(model, quad_setup):
    """Short-horizon trot solve: converges with the arm exactly frozen."""
    cfg, ocp, x0, targets = quad_setup
    cfg.mpc.time_horizon = 0.21
    sched, stage = _trot_stage(model, cfg, targets, horizon=0.21)
    solver = SqpSolver(model, ocp, cfg)
    sol = solver.solve(stage, x0)
    for _ in range(4):
        sol = solver.solve(stage, x0, warm=(sol.times, sol.X, sol.U))

    assert float(sol.constraint_violation) < 1e-5
    # arm velocity inputs exactly zero; arm joints stay at the default pose
    np.testing.assert_allclose(np.asarray(sol.U[:, 24:30]), 0.0, atol=1e-10)
    np.testing.assert_allclose(
        np.asarray(sol.X[:, 24:30] - x0[24:30][None]), 0.0, atol=1e-8)


@pytest.mark.slow
def test_quad_only_trot_closed_loop(model):
    """Config #1 golden: the arm-welded variant trots on flat ground with
    the full stack (sim + WBC arm-hold + quad-only MPC)."""
    import numpy as np

    from qm_door_tpu.config import quad_only_config
    from qm_door_tpu.models import kinematics, spatial
    from qm_door_tpu.ocp.gait import GAIT_LIBRARY, GaitSchedule
    from qm_door_tpu.ocp.reference import TargetTrajectories
    from qm_door_tpu.sim.closed_loop import ClosedLoopRunner

    cfg = quad_only_config()
    cfg.controller.leg_pd_start_time = -1.0

    x0 = jnp.asarray(cfg.initial_state())
    R_ee, p_ee = kinematics.ee_pose(model, x0[6:30])
    state = jnp.concatenate([x0, p_ee, spatial.rot_to_quat(R_ee)])
    targets = TargetTrajectories.create(
        jnp.array([0.0, 1e5]), jnp.stack([state, state]), jnp.zeros((2, 30)))
    sched = GaitSchedule()
    sched.insert_template(GAIT_LIBRARY["trot"], 0.0, 5.0)
    runner = ClosedLoopRunner(model, cfg, schedule=sched)
    log = runner.run(targets, duration=1.0)

    assert log.safe
    base = np.stack(log.base_pose)
    assert 0.33 < base[-1, 2] < 0.45
    assert np.abs(base[:, 4:6]).max() < 0.15
    assert np.abs(base[-1, 0:2]).max() < 0.1
    # welded arm: joints stay at the default pose throughout
    x = np.stack(log.x_obs)
    arm_dev = np.abs(x[:, 24:30] - np.asarray(cfg.initial_state())[24:30])
    assert arm_dev.max() < 0.12, arm_dev.max()
    assert log.mpc_viol[-1] < 1e-3
