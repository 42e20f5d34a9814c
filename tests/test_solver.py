import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qm_door_tpu.config import default_config
from qm_door_tpu.ocp.gait import GaitSchedule, GAIT_LIBRARY
from qm_door_tpu.ocp.problem import build_stage_data, make_ocp_config
from qm_door_tpu.ocp.reference import TargetTrajectories
from qm_door_tpu.solver.riccati import lqr_solve, riccati_backward, riccati_forward
from qm_door_tpu.solver.transcription import ProjectedLq, linearize_ocp, project_ocp
from qm_door_tpu.solver import sqp as sqp_mod


def _random_lq(rng, N=6, nx=4, nu=3):
    def psd(n, scale=1.0):
        A = rng.normal(size=(n, n))
        return scale * (A @ A.T + n * np.eye(n))

    A = rng.normal(size=(N, nx, nx)) * 0.3 + np.eye(nx)
    B = rng.normal(size=(N, nx, nu))
    d = rng.normal(size=(N, nx)) * 0.1
    lxx = np.stack([psd(nx) for _ in range(N)])
    luu = np.stack([psd(nu) for _ in range(N)])
    lux = rng.normal(size=(N, nu, nx)) * 0.1
    lx = rng.normal(size=(N, nx))
    lu = rng.normal(size=(N, nu))
    lxx_f = psd(nx)
    lx_f = rng.normal(size=nx)
    return ProjectedLq(
        A=jnp.asarray(A), B=jnp.asarray(B), d=jnp.asarray(d),
        lx=jnp.asarray(lx), lu=jnp.asarray(lu),
        lxx=jnp.asarray(lxx), luu=jnp.asarray(luu), lux=jnp.asarray(lux),
        lx_f=jnp.asarray(lx_f), lxx_f=jnp.asarray(lxx_f),
        p=jnp.zeros((N, nx, )) * 0,  # unused in this test
        Pu=jnp.zeros((N, nx, nu)), Px=jnp.zeros((N, nx, nx)),
    )


def _dense_lq_solve(lq, dx0):
    """Reference: solve the same LQ problem as one dense equality-constrained QP."""
    N, nx, nu = lq.A.shape[0], lq.A.shape[1], lq.B.shape[2]
    nz = (N + 1) * nx + N * nu  # [dx_0..dx_N, du_0..du_{N-1}]
    H = np.zeros((nz, nz))
    g = np.zeros(nz)

    def xi(k):
        return slice(k * nx, (k + 1) * nx)

    def ui(k):
        return slice((N + 1) * nx + k * nu, (N + 1) * nx + (k + 1) * nu)

    for k in range(N):
        H[xi(k), xi(k)] += np.asarray(lq.lxx[k])
        H[ui(k), ui(k)] += np.asarray(lq.luu[k])
        H[ui(k), xi(k)] += np.asarray(lq.lux[k])
        H[xi(k), ui(k)] += np.asarray(lq.lux[k]).T
        g[xi(k)] += np.asarray(lq.lx[k])
        g[ui(k)] += np.asarray(lq.lu[k])
    H[xi(N), xi(N)] += np.asarray(lq.lxx_f)
    g[xi(N)] += np.asarray(lq.lx_f)

    # constraints: dx_0 = dx0; dx_{k+1} = A dx_k + B du_k + d
    nc = (N + 1) * nx
    C = np.zeros((nc, nz))
    b = np.zeros(nc)
    C[0:nx, xi(0)] = np.eye(nx)
    b[0:nx] = np.asarray(dx0)
    for k in range(N):
        rows = slice((k + 1) * nx, (k + 2) * nx)
        C[rows, xi(k + 1)] = -np.eye(nx)
        C[rows, xi(k)] = np.asarray(lq.A[k])
        C[rows, ui(k)] = np.asarray(lq.B[k])
        b[rows] = -np.asarray(lq.d[k])

    KKT = np.block([[H, C.T], [C, np.zeros((nc, nc))]])
    rhs = np.concatenate([-g, b])
    sol = np.linalg.solve(KKT, rhs)
    dX = sol[: (N + 1) * nx].reshape(N + 1, nx)
    dU = sol[(N + 1) * nx : nz].reshape(N, nu)
    return dX, dU


def test_riccati_matches_dense_kkt(rng):
    lq = _random_lq(rng)
    dx0 = jnp.asarray(rng.normal(size=4))
    K, kff, _, _ = riccati_backward(lq)
    dX, dU_red, _ = riccati_forward(lq, K, kff, dx0)
    dX_ref, dU_ref = _dense_lq_solve(lq, dx0)
    np.testing.assert_allclose(dX, dX_ref, atol=1e-8)
    np.testing.assert_allclose(dU_red, dU_ref, atol=1e-8)


@pytest.fixture()
def mpc_setup(mpc_stack):
    return mpc_stack


def test_projection_satisfies_constraints(mpc_setup, rng):
    """After projection, recovered du must satisfy the linearized equalities
    for any reduced input and any dx."""
    model, cfg, ocp, solver, x0, targets = mpc_setup
    sched = GaitSchedule()
    sched.insert_template(GAIT_LIBRARY["trot"], 0.0, 3.0)
    stage = build_stage_data(model, cfg, sched, targets, 0.0)
    N = solver.n_intervals
    X, U = solver.cold_start(stage, x0)
    lq = linearize_ocp(model, ocp, stage, cfg.sqp.dt, X, U)

    for method, nu_red in [("qr", 26), ("chol", 30)]:
        plq = project_ocp(lq, stage, U, method=method)
        for k in [0, 10, 33]:
            dx = jnp.asarray(rng.normal(size=30) * 0.01)
            u_red = jnp.asarray(rng.normal(size=nu_red))
            du = plq.p[k] + plq.Pu[k] @ u_red + plq.Px[k] @ dx
            # linearized velocity rows: g0 + Gx dx + Gv du_j == 0 (masked rows)
            resid = lq.g0[k] + lq.Gx[k] @ dx + lq.Gv[k] @ du[12:30]
            np.testing.assert_allclose(resid, 0.0, atol=1e-8)
            # swing forces pinned to -F_bar (new F = 0)
            flags = np.asarray(stage.contact_flags[k])
            swing = np.repeat(flags == 0, 3)
            np.testing.assert_allclose(
                np.asarray(U[k, :12] + du[:12])[swing], 0.0, atol=1e-10
            )


def test_mpc_stance_hold(mpc_setup):
    """Stance MPC from the nominal state with a hold target: solution stays
    near the initial state and uses ~weight-compensating forces."""
    model, cfg, ocp, solver, x0, targets = mpc_setup
    sched = GaitSchedule()  # stance forever
    stage = build_stage_data(model, cfg, sched, targets, 0.0)
    sol = solver.solve(stage, x0)
    assert np.isfinite(float(sol.cost))
    assert float(sol.step_size) > 0.0
    # states remain near x0
    assert float(jnp.max(jnp.abs(sol.X[:, 6:12] - x0[6:12]))) < 0.05
    # vertical forces sum to ~weight
    m = float(jnp.sum(model.body_mass)) * 9.81
    fz = np.asarray(sol.U[:, 2:12:3]).sum(axis=1)
    np.testing.assert_allclose(fz, m, rtol=0.2)
    # one cold-start SQP iteration: violation within g_max (warm-started MPC
    # solves drive it to ~1e-7, see test_mpc_stance_converges)
    assert float(sol.constraint_violation) < 1e-2


def test_mpc_stance_converges(mpc_setup):
    """Two warm-started solves reach near-exact feasibility."""
    model, cfg, ocp, solver, x0, targets = mpc_setup
    sched = GaitSchedule()
    stage = build_stage_data(model, cfg, sched, targets, 0.0)
    sol = solver.solve(stage, x0)
    sol2 = solver.solve(stage, x0, warm=(sol.times, sol.X, sol.U))
    assert float(sol2.constraint_violation) < 1e-5


def test_mpc_trot_solves(mpc_setup):
    model, cfg, ocp, solver, x0, targets = mpc_setup
    sched = GaitSchedule()
    sched.insert_template(GAIT_LIBRARY["trot"], 0.0, 3.0)
    stage = build_stage_data(model, cfg, sched, targets, 0.0)
    sol = solver.solve(stage, x0)
    assert np.isfinite(float(sol.cost))
    assert float(sol.step_size) > 0.0
    # swing feet carry no force at nodes where they are in swing
    flags = np.asarray(stage.contact_flags[:-1])
    F = np.asarray(sol.U[:, :12]).reshape(-1, 4, 3)
    swing_F = F[flags == 0]
    np.testing.assert_allclose(swing_F, 0.0, atol=1e-6)


def test_projection_backends_equivalent(mpc_setup, rng):
    """Cholesky-projector and QR-basis projections yield the same SQP step."""
    from qm_door_tpu.solver.riccati import lqr_solve

    model, cfg, ocp, solver, x0, targets = mpc_setup
    sched = GaitSchedule()
    sched.insert_template(GAIT_LIBRARY["trot"], 0.0, 3.0)
    stage = build_stage_data(model, cfg, sched, targets, 0.0)
    X, U = solver.cold_start(stage, x0)
    lq = linearize_ocp(model, ocp, stage, cfg.sqp.dt, X, U)
    dx0 = jnp.zeros(30)
    plq_qr = project_ocp(lq, stage, U, method="qr")
    plq_ch = project_ocp(lq, stage, U, method="chol")
    dX1, dU1, _, _ = lqr_solve(plq_qr, dx0)
    dX2, dU2, _, _ = lqr_solve(plq_ch, dx0)
    np.testing.assert_allclose(dU1, dU2, atol=1e-6)
    np.testing.assert_allclose(dX1, dX2, atol=1e-6)


def test_fused_linearization_matches_reference(mpc_setup):
    """The fused (shared-pipeline, analytic force columns) node linearization
    must match the straightforward per-pipeline reference exactly."""
    import jax
    from qm_door_tpu.solver.transcription import (
        _node_linearization,
        _node_linearization_reference,
    )

    model, cfg, ocp, solver, x0, targets = mpc_setup
    sched = GaitSchedule()
    sched.insert_template(GAIT_LIBRARY["trot"], 0.0, 3.0)
    stage = build_stage_data(model, cfg, sched, targets, 0.0)
    X, U = solver.cold_start(stage, x0)
    # perturb so nothing is at a special point
    rng_l = np.random.default_rng(3)
    X = X + jnp.asarray(rng_l.normal(size=X.shape) * 0.01)
    U = U + jnp.asarray(rng_l.normal(size=U.shape) * 1.0)

    # jit both paths: the eager graphs are enormous and have segfaulted the
    # XLA CPU compiler when run late in a long test session
    fused_fn = jax.jit(
        lambda k, x, u, xn: _node_linearization(model, ocp, stage, cfg.sqp.dt, k, x, u, xn)
    )
    ref_fn = jax.jit(
        lambda k, x, u, xn: _node_linearization_reference(model, ocp, stage, cfg.sqp.dt, k, x, u, xn)
    )
    for k in [0, 7, 40]:
        fused = fused_fn(k, X[k], U[k], X[k + 1])
        ref = ref_fn(k, X[k], U[k], X[k + 1])
        for a, b in zip(fused, ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-9)


def test_analytic_linearization_matches_ad(mpc_setup):
    """The analytic/geometric node linearization (lin_tangents="analytic":
    closed-form momentum-rate and EE rows, 6-cotangent reverse CMM pass,
    FK-only foot-velocity sweep — no 21-tangent sweep through the full
    stage-1 graph) must match the AD path to f64 roundoff, for both RK2
    sensitivity modes."""
    import jax
    from qm_door_tpu.solver.transcription import _node_linearization

    model, cfg, ocp, solver, x0, targets = mpc_setup
    sched = GaitSchedule()
    sched.insert_template(GAIT_LIBRARY["trot"], 0.0, 3.0)
    stage = build_stage_data(model, cfg, sched, targets, 0.0)
    X, U = solver.cold_start(stage, x0)
    rng_l = np.random.default_rng(5)
    X = X + jnp.asarray(rng_l.normal(size=X.shape) * 0.01)
    U = U + jnp.asarray(rng_l.normal(size=U.shape) * 1.0)

    for sens in ("frozen", "rk2"):
        ad_fn = jax.jit(lambda k, x, u, xn, s=sens: _node_linearization(
            model, ocp, stage, cfg.sqp.dt, k, x, u, xn,
            sensitivity=s, tangents="f32"))
        an_fn = jax.jit(lambda k, x, u, xn, s=sens: _node_linearization(
            model, ocp, stage, cfg.sqp.dt, k, x, u, xn,
            sensitivity=s, tangents="analytic"))
        for k in [0, 7, 40]:
            ad = ad_fn(k, X[k], U[k], X[k + 1])
            an = an_fn(k, X[k], U[k], X[k + 1])
            for a, b in zip(ad, an):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), atol=1e-10)


def test_frozen_sensitivity_same_fixed_point(mpc_setup):
    """'frozen' RK2 sensitivity (second-stage Jacobian reused from the first)
    must converge to the same solution as the exact discrete sensitivity:
    the defects are exact RK2 either way, so only the convergence PATH may
    differ, not the fixed point."""
    import copy

    from qm_door_tpu.solver.sqp import SqpSolver

    model, cfg, ocp, solver, x0, targets = mpc_setup
    sched = GaitSchedule()
    sched.insert_template(GAIT_LIBRARY["trot"], 0.0, 3.0)

    sols = {}
    for mode in ("rk2", "frozen"):
        c = copy.deepcopy(cfg)
        c.mpc.time_horizon = 0.3
        c.sqp.sensitivity = mode
        s = SqpSolver(model, ocp, c)
        stage = build_stage_data(model, c, sched, targets, 0.0,
                                 horizon=c.mpc.time_horizon)
        sol = s.solve(stage, x0)
        for _ in range(5):
            sol = s.solve(stage, x0, warm=(sol.times, sol.X, sol.U))
        assert float(sol.constraint_violation) < 1e-6, mode
        sols[mode] = sol

    # The inexact constraint Jacobian perturbs the stationarity condition, so
    # the optimum shifts by O(dt^2): measured max |dX| = 3.3e-3 state units
    # (joint angles ~0.5 rad scale) at dt 0.015 — the closed-loop goldens
    # (tests/test_closed_loop*) bound the behavioral effect.
    np.testing.assert_allclose(
        np.asarray(sols["frozen"].X), np.asarray(sols["rk2"].X),
        atol=1e-2,
    )
    np.testing.assert_allclose(
        np.asarray(sols["frozen"].U), np.asarray(sols["rk2"].U),
        atol=1e-1,
    )


def test_bf16_tangent_linearization_close(mpc_setup):
    """bf16 tangent sweep (lin_tangents="bf16"): the defects d and primal
    constraint values must be EXACT (f32/f64 primal path), the Jacobians
    within bf16 relative error of the f32 reference."""
    import jax

    from qm_door_tpu.solver.transcription import _node_linearization

    model, cfg, ocp, solver, x0, targets = mpc_setup
    sched = GaitSchedule()
    sched.insert_template(GAIT_LIBRARY["trot"], 0.0, 3.0)
    stage = build_stage_data(model, cfg, sched, targets, 0.0)
    X, U = solver.cold_start(stage, x0)
    rng_l = np.random.default_rng(5)
    X = X + jnp.asarray(rng_l.normal(size=X.shape) * 0.01)
    U = U + jnp.asarray(rng_l.normal(size=U.shape) * 1.0)

    f32_fn = jax.jit(lambda k, x, u, xn: _node_linearization(
        model, ocp, stage, cfg.sqp.dt, k, x, u, xn, sensitivity="frozen"))
    b16_fn = jax.jit(lambda k, x, u, xn: _node_linearization(
        model, ocp, stage, cfg.sqp.dt, k, x, u, xn, sensitivity="frozen",
        tangents="bf16"))
    for k in [0, 23]:
        ref = f32_fn(k, X[k], U[k], X[k + 1])
        b16 = b16_fn(k, X[k], U[k], X[k + 1])
        A, B, d = ref[0], ref[1], ref[2]
        Ab, Bb, db = b16[0], b16[1], b16[2]
        g0, Gx, Gv = ref[9], ref[10], ref[11]
        g0b, Gxb, Gvb = b16[9], b16[10], b16[11]
        # exact: defects, constraint values, Gv (analytic rows)
        np.testing.assert_allclose(np.asarray(db), np.asarray(d), rtol=0, atol=0)
        np.testing.assert_allclose(np.asarray(g0b), np.asarray(g0), rtol=0, atol=0)
        np.testing.assert_allclose(np.asarray(Gvb), np.asarray(Gv), rtol=0, atol=0)
        # bf16-level: the q-columns of A and Gx (8-bit mantissa ~ 0.4% rel)
        scale = np.abs(np.asarray(A)).max()
        assert np.abs(np.asarray(Ab) - np.asarray(A)).max() < 2e-2 * scale
        scale_g = max(np.abs(np.asarray(Gx)).max(), 1.0)
        assert np.abs(np.asarray(Gxb) - np.asarray(Gx)).max() < 2e-2 * scale_g
        scale_b = max(np.abs(np.asarray(B)).max(), 1.0)
        assert np.abs(np.asarray(Bb) - np.asarray(B)).max() < 2e-2 * scale_b
