"""Reference-derived oracles for the transcription math (VERDICT r1 item 7).

The solver's per-node LQ assembly claims to implement OCS2's documented
discretization — RK2 (Heun) shooting on the centroidal dynamics with
relaxed-barrier inequality penalties (mu=0.1, delta=5.0; reference
qm_controllers/config/task.info:75-93 and ocs2_core RelaxedBarrierPenalty).
These tests validate that claim through INDEPENDENT math: plain-Python
scalar formulas for the barrier, and central finite differences (no
autodiff) for the RK2 sensitivities and cost gradients. The dense-KKT
Riccati oracle lives in tests/test_solver.py.
"""
import math

import jax.numpy as jnp
import numpy as np
import pytest

from qm_door_tpu.config import default_config
from qm_door_tpu.models import centroidal, kinematics, spatial
from qm_door_tpu.ocp.gait import GaitSchedule
from qm_door_tpu.ocp.problem import (
    build_stage_data,
    make_ocp_config,
    quadratize_stage,
    stage_cost,
)
from qm_door_tpu.ocp.reference import TargetTrajectories
from qm_door_tpu.solver.transcription import linearize_ocp


# ---------------------------------------------------------------------------
# relaxed barrier vs the ocs2 formula written out in scalar Python
# ---------------------------------------------------------------------------

def _rb_scalar(h, mu, delta):
    """ocs2 RelaxedBarrierPenalty::getValue, transcribed from the paper
    formula (Feller & Ebenbauer relaxed log barrier):
    p(h) = -mu ln h for h >= delta, else the quadratic extension."""
    if h >= delta:
        return -mu * math.log(h)
    z = (h - 2.0 * delta) / delta
    return mu * (0.5 * z * z - 0.5 - math.log(delta))


def test_relaxed_barrier_matches_scalar_formula():
    from qm_door_tpu.ocp import penalties

    mu, delta = 0.1, 5.0  # config.py barrier_mu/delta = task.info values
    hs = [20.0, 5.1, 5.0, 4.9, 1.0, 0.0, -3.0]
    for h in hs:
        got = float(penalties.relaxed_barrier(
            jnp.asarray(h, jnp.float64), mu, delta))
        assert got == pytest.approx(_rb_scalar(h, mu, delta), abs=1e-12), h


def test_relaxed_barrier_derivatives_fd_and_c2_continuity():
    from qm_door_tpu.ocp import penalties

    mu, delta = 0.1, 5.0
    eps = 1e-6
    for h in [20.0, 5.2, 4.8, 1.0, -2.0]:
        d_fd = (_rb_scalar(h + eps, mu, delta)
                - _rb_scalar(h - eps, mu, delta)) / (2 * eps)
        dd_fd = (_rb_scalar(h + eps, mu, delta) - 2 * _rb_scalar(h, mu, delta)
                 + _rb_scalar(h - eps, mu, delta)) / (eps * eps)
        d = float(penalties.relaxed_barrier_d(jnp.asarray(h, jnp.float64), mu, delta))
        dd = float(penalties.relaxed_barrier_dd(jnp.asarray(h, jnp.float64), mu, delta))
        assert d == pytest.approx(d_fd, rel=1e-6, abs=1e-8), h
        assert dd == pytest.approx(dd_fd, rel=1e-3, abs=1e-4), h
    # C2 continuity at the switch: both branches agree at h = delta
    for fn in (penalties.relaxed_barrier, penalties.relaxed_barrier_d,
               penalties.relaxed_barrier_dd):
        lo = float(fn(jnp.asarray(delta - 1e-9, jnp.float64), mu, delta))
        hi = float(fn(jnp.asarray(delta + 1e-9, jnp.float64), mu, delta))
        assert lo == pytest.approx(hi, rel=1e-6, abs=1e-8)


# ---------------------------------------------------------------------------
# RK2 sensitivities + cost gradients vs central finite differences
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def two_node_problem(model):
    """A 2-interval stance problem at the production dt."""
    cfg = default_config()
    cfg.mpc.time_horizon = 2 * cfg.sqp.dt
    ocp = make_ocp_config(model, cfg)
    x0 = jnp.asarray(cfg.initial_state(), jnp.float64)
    R_ee, p_ee = kinematics.ee_pose(model, x0[6:30])
    state = jnp.concatenate([x0, p_ee, spatial.rot_to_quat(R_ee)])
    targets = TargetTrajectories.create(
        jnp.array([0.0, 1e5]), jnp.stack([state, state]), jnp.zeros((2, 30))
    )
    stage = build_stage_data(model, cfg, GaitSchedule(), targets, 0.0)
    # evaluate AWAY from the nominal so gradients are nonzero
    rng = np.random.default_rng(3)
    N = stage.times.shape[0] - 1
    X = jnp.asarray(np.tile(np.asarray(x0), (N + 1, 1))
                    + 0.02 * rng.normal(size=(N + 1, 30)))
    U = jnp.asarray(np.tile(np.asarray(stage.u_nom[0]), (N, 1))
                    + 1.0 * rng.normal(size=(N, 30)))
    return cfg, ocp, stage, X, U


def _rk2_numpy(model, x, u, dt):
    """Heun step written independently with numpy glue around flow_map only
    (transcription.py:46-52 claims exactly this discretization)."""
    f1 = np.asarray(centroidal.flow_map(model, jnp.asarray(x), jnp.asarray(u)))
    f2 = np.asarray(centroidal.flow_map(
        model, jnp.asarray(x + dt * f1), jnp.asarray(u)))
    return np.asarray(x) + 0.5 * dt * (f1 + f2)


def test_rk2_sensitivity_matches_finite_differences(model, two_node_problem):
    cfg, ocp, stage, X, U = two_node_problem
    dt = cfg.sqp.dt
    lq = linearize_ocp(model, ocp, stage, dt, X, U, sensitivity="rk2")

    k = 0
    x = np.asarray(X[k], np.float64)
    u = np.asarray(U[k], np.float64)

    # defect oracle: d = rk2(x, u) - x_next
    d_ref = _rk2_numpy(model, x, u, dt) - np.asarray(X[k + 1])
    np.testing.assert_allclose(np.asarray(lq.d[k]), d_ref, atol=1e-10)

    # A = d rk2 / dx, B = d rk2 / du by central differences
    eps = 1e-6
    A_fd = np.zeros((30, 30))
    B_fd = np.zeros((30, 30))
    for i in range(30):
        ei = np.zeros(30)
        ei[i] = eps
        A_fd[:, i] = (_rk2_numpy(model, x + ei, u, dt)
                      - _rk2_numpy(model, x - ei, u, dt)) / (2 * eps)
        B_fd[:, i] = (_rk2_numpy(model, x, u + ei, dt)
                      - _rk2_numpy(model, x, u - ei, dt)) / (2 * eps)
    np.testing.assert_allclose(np.asarray(lq.A[k]), A_fd, atol=5e-7)
    np.testing.assert_allclose(np.asarray(lq.B[k]), B_fd, atol=5e-7)


def test_stage_cost_gradient_matches_finite_differences(model, two_node_problem):
    """lx/lu from the closed-form quadratization vs FD of stage_cost.
    (The Hessian is deliberately Gauss-Newton for the EE term — OCS2's
    Linear-order soft constraint — so only gradients are FD-checked.)"""
    cfg, ocp, stage, X, U = two_node_problem
    k = 0
    x, u = X[k], U[k]
    out = quadratize_stage(model, ocp, stage, k, x, u)
    lx, lu = np.asarray(out[1]), np.asarray(out[2])

    def c(xx, uu):
        return float(stage_cost(model, ocp, stage, k,
                                jnp.asarray(xx), jnp.asarray(uu)))

    eps = 1e-6
    xnp, unp = np.asarray(x, np.float64), np.asarray(u, np.float64)
    lx_fd = np.zeros(30)
    lu_fd = np.zeros(30)
    for i in range(30):
        ei = np.zeros(30)
        ei[i] = eps
        lx_fd[i] = (c(xnp + ei, unp) - c(xnp - ei, unp)) / (2 * eps)
        lu_fd[i] = (c(xnp, unp + ei) - c(xnp, unp - ei)) / (2 * eps)
    np.testing.assert_allclose(lx, lx_fd, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(lu, lu_fd, rtol=2e-4, atol=2e-5)
