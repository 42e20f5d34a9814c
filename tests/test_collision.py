"""Self-collision soft constraint (ocp/collision.py; ocs2_self_collision
role, declared at QMInterface.h:19,50,89)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qm_door_tpu.config import default_config
from qm_door_tpu.ocp import collision
from qm_door_tpu.ocp.problem import make_ocp_config


@pytest.fixture(scope="module")
def enabled_ocp(model):
    cfg = default_config()
    cfg.self_collision.mu = 0.1
    return make_ocp_config(model, cfg)


def test_nominal_pose_is_clear(model, enabled_ocp):
    """At the reference stance the arm is folded above the trunk — every
    pair must be comfortably clear (constraint inactive: barrier in its
    log branch, cost small)."""
    cfg = default_config()
    x0 = jnp.asarray(cfg.initial_state())
    h = collision.pair_clearances(model, x0[6:30],
                                  enabled_ocp.self_collision_margin)
    assert float(jnp.min(h)) > 0.0
    c = collision.self_collision_cost(model, enabled_ocp, x0)
    # log-branch cost at >0 clearance is bounded by -mu log(h_min)
    assert float(c) < 5.0


def test_penalty_grows_as_arm_approaches_leg(model, enabled_ocp):
    """Lowering the shoulder (z1_joint_2 down from the folded default 1.11)
    swings the forearm toward the front legs: min clearance shrinks
    (measured 0.25 m at 0.0 -> 0.02 m at -0.8) and the penalty grows."""
    cfg = default_config()
    x0 = np.asarray(cfg.initial_state())
    costs, hmins = [], []
    for q2 in (1.11, 0.4, 0.0, -0.8):
        x = x0.copy()
        x[25] = q2
        xj = jnp.asarray(x)
        costs.append(float(collision.self_collision_cost(
            model, enabled_ocp, xj)))
        hmins.append(float(jnp.min(collision.pair_clearances(
            model, xj[6:30], enabled_ocp.self_collision_margin))))
    assert hmins[0] > hmins[-1]
    assert all(a <= b + 1e-9 for a, b in zip(costs, costs[1:])), costs
    assert costs[-1] > costs[0] + 1.0  # near-contact pose is heavily penalized
    h = collision.pair_clearances(model, jnp.asarray(x0)[6:30], 0.05)
    assert h.shape == (len(collision.ARM_SPHERES) * len(collision.LEG_SPHERES),)


def test_gauss_newton_gradient_matches_fd(model, enabled_ocp):
    cfg = default_config()
    x = np.asarray(cfg.initial_state())
    x[25] = 1.2  # bring pairs near activation so gradients are non-trivial
    xj = jnp.asarray(x)
    l, lx, lxx = collision.quadratize_self_collision(model, enabled_ocp, xj)
    assert l == pytest.approx(float(collision.self_collision_cost(
        model, enabled_ocp, xj)), rel=1e-10)

    eps = 1e-6
    lx_fd = np.zeros(30)
    for i in range(6, 30):
        e = np.zeros(30)
        e[i] = eps
        cp = float(collision.self_collision_cost(model, enabled_ocp,
                                                 jnp.asarray(x + e)))
        cm = float(collision.self_collision_cost(model, enabled_ocp,
                                                 jnp.asarray(x - e)))
        lx_fd[i] = (cp - cm) / (2 * eps)
    np.testing.assert_allclose(np.asarray(lx), lx_fd, rtol=1e-4, atol=1e-7)
    # GN Hessian is PSD
    w = np.linalg.eigvalsh(np.asarray(lxx))
    assert w.min() > -1e-9


def test_solver_runs_with_self_collision_enabled(model):
    """The full SQP stays jittable and feasible with the constraint on."""
    from qm_door_tpu.ocp.gait import GaitSchedule
    from qm_door_tpu.ocp.problem import build_stage_data
    from qm_door_tpu.ocp.reference import TargetTrajectories
    from qm_door_tpu.models import kinematics, spatial
    from qm_door_tpu.solver.sqp import SqpSolver

    cfg = default_config()
    cfg.self_collision.mu = 0.1
    cfg.mpc.time_horizon = 6 * cfg.sqp.dt  # short horizon keeps compile fast
    ocp = make_ocp_config(model, cfg)
    solver = SqpSolver(model, ocp, cfg)
    x0 = jnp.asarray(cfg.initial_state())
    R_ee, p_ee = kinematics.ee_pose(model, x0[6:30])
    state = jnp.concatenate([x0, p_ee, spatial.rot_to_quat(R_ee)])
    targets = TargetTrajectories.create(
        jnp.array([0.0, 1e5]), jnp.stack([state, state]), jnp.zeros((2, 30)))
    stage = build_stage_data(model, cfg, GaitSchedule(), targets, 0.0)
    sol = solver.solve(stage, x0)
    assert np.isfinite(float(sol.cost))
    assert float(sol.constraint_violation) < 1e-3
