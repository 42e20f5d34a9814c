import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qm_door_tpu.config import default_config
from qm_door_tpu.models import centroidal, dynamics
from qm_door_tpu.models.model import GRAVITY
from qm_door_tpu.wbc.qp import solve_qp
from qm_door_tpu.wbc.hoqp import Task, null_space_masked, solve_hierarchy
from qm_door_tpu.wbc.wbc import WbcState, hierarchical_wbc


def _random_qp(rng, n=8, m=12):
    A = rng.normal(size=(n, n))
    H = A @ A.T + n * np.eye(n)
    c = rng.normal(size=n)
    G = rng.normal(size=(m, n))
    h = rng.normal(size=m) + 2.0
    return H, c, G, h


def _scipy_qp(H, c, G, h):
    from scipy.optimize import minimize

    n = H.shape[0]
    res = minimize(
        lambda z: 0.5 * z @ H @ z + c @ z,
        np.zeros(n),
        jac=lambda z: H @ z + c,
        constraints=[{"type": "ineq", "fun": lambda z: h - G @ z, "jac": lambda z: -G}],
        method="SLSQP",
        options={"maxiter": 200, "ftol": 1e-12},
    )
    return res.x


def test_qp_matches_scipy(rng):
    for _ in range(5):
        H, c, G, h = _random_qp(rng)
        z, lam, s = solve_qp(jnp.asarray(H), jnp.asarray(c), jnp.asarray(G), jnp.asarray(h), iters=40)
        z_ref = _scipy_qp(H, c, G, h)
        np.testing.assert_allclose(np.asarray(z), z_ref, atol=1e-5)


def test_qp_kkt_conditions(rng):
    H, c, G, h = _random_qp(rng, n=20, m=30)
    z, lam, s = solve_qp(jnp.asarray(H), jnp.asarray(c), jnp.asarray(G), jnp.asarray(h), iters=40)
    z, lam, s = map(np.asarray, (z, lam, s))
    # primal feasibility
    assert (G @ z - h).max() < 1e-7
    # stationarity
    np.testing.assert_allclose(H @ z + c + G.T @ lam, 0.0, atol=1e-6)
    # complementarity
    assert np.abs(lam * (G @ z - h)).max() < 1e-6


def test_null_space_masked(rng):
    M = rng.normal(size=(3, 8))
    M[1] = 0.0  # masked row
    Z = np.asarray(null_space_masked(jnp.asarray(M)))
    # columns either zero or in the null space
    live = np.linalg.norm(Z, axis=0) > 1e-9
    assert live.sum() == 8 - 2  # rank 2
    np.testing.assert_allclose(M @ Z, 0.0, atol=1e-10)


def test_hierarchy_respects_priorities(rng):
    """Lower-priority tasks must not perturb the higher-priority optimum."""
    n = 6
    A0 = rng.normal(size=(2, n))
    b0 = rng.normal(size=2)
    A1 = rng.normal(size=(3, n))
    b1 = rng.normal(size=3)
    D0 = rng.normal(size=(4, n))
    f0 = rng.normal(size=4) + 3.0
    t0 = Task(jnp.asarray(A0), jnp.asarray(b0), jnp.asarray(D0), jnp.asarray(f0))
    t1 = Task(jnp.asarray(A1), jnp.asarray(b1), jnp.zeros((0, n)), jnp.zeros(0))
    x = np.asarray(solve_hierarchy([t0, t1], qp_iters=40))
    # level-0 equalities satisfied exactly (feasible, full rank 2 < 6)
    np.testing.assert_allclose(A0 @ x, b0, atol=1e-6)
    # inequalities respected
    assert (D0 @ x - f0).max() < 1e-6
    # level-1 solved in the null space: residual equals the constrained optimum
    from scipy.optimize import minimize

    res = minimize(
        lambda z: np.sum((A1 @ z - b1) ** 2),
        x,
        constraints=[
            {"type": "eq", "fun": lambda z: A0 @ z - b0},
            {"type": "ineq", "fun": lambda z: f0 - D0 @ z},
        ],
        method="SLSQP",
        options={"maxiter": 300, "ftol": 1e-14},
    )
    assert np.sum((A1 @ x - b1) ** 2) <= np.sum((A1 @ res.x - b1) ** 2) + 1e-5


@pytest.fixture(scope="module")
def wbc_setup():
    from qm_door_tpu.models import aliengo_z1

    model = aliengo_z1()
    cfg = default_config()
    x0 = jnp.asarray(cfg.initial_state())
    q0 = centroidal.pinocchio_q(x0)
    v0 = jnp.zeros(24)
    rbd = centroidal.rbd_from_generalized(model, q0, v0)
    return model, cfg, x0, rbd


def _moment_balanced_input(model, x0):
    """Minimum-norm stance forces with zero net moment about the com (a true
    static equilibrium, unlike the naive equal-z split which leaves a pitch
    moment because of the arm)."""
    q0 = centroidal.pinocchio_q(x0)
    from qm_door_tpu.models import kinematics

    p = np.asarray(kinematics.contact_positions(model, q0))
    c = np.asarray(dynamics.com_position(model, q0))
    m_tot = float(jnp.sum(model.body_mass))
    A = np.zeros((6, 12))
    for i in range(4):
        A[0:3, 3 * i : 3 * i + 3] = np.eye(3)
        r = p[i] - c
        A[3:6, 3 * i : 3 * i + 3] = np.array(
            [[0, -r[2], r[1]], [r[2], 0, -r[0]], [-r[1], r[0], 0]]
        )
    rhs = np.concatenate([[0, 0, m_tot * GRAVITY], np.zeros(3)])
    F = np.linalg.lstsq(A, rhs, rcond=None)[0]
    return jnp.asarray(np.concatenate([F, np.zeros(18)]))


def test_wbc_equilibrium_stance(wbc_setup):
    """At the nominal stance with desired == measured and moment-balanced
    forces, the WBC must output ~zero accelerations, the MPC forces, and
    gravity-compensation torques."""
    model, cfg, x0, rbd = wbc_setup
    flags = jnp.ones(4)
    u_des = _moment_balanced_input(model, x0)
    cmd, _ = hierarchical_wbc(
        model, cfg.wbc, x0, u_des, rbd, flags,
        WbcState.init(), 0.002, use_arm_init=False, qp_iters=40,
    )
    qdd = np.asarray(cmd[:24])
    F = np.asarray(cmd[24:36])
    tau = np.asarray(cmd[36:54])

    # forces follow the MPC request (priority-2 task in a feasible scenario)
    np.testing.assert_allclose(F, np.asarray(u_des[:12]), atol=2.0)
    # accelerations near zero
    assert np.abs(qdd).max() < 1.0

    # torque consistency: full EoM must balance with the solved contact forces
    q0 = centroidal.pinocchio_q(x0)
    M = np.asarray(dynamics.mass_matrix(model, q0))
    h = np.asarray(dynamics.nonlinear_effects(model, q0, jnp.zeros(24)))
    from qm_door_tpu.models import kinematics

    Jc = np.asarray(
        kinematics.frame_jacobians(model, q0, model.contact_frame_ids)[:, :3, :]
    ).reshape(12, 24)
    resid = M @ qdd + h - Jc.T @ F - np.concatenate([np.zeros(6), tau])
    np.testing.assert_allclose(resid, 0.0, atol=1e-4)
    # torques within limits
    assert (np.abs(tau) <= np.asarray(model.effort_limit) + 1e-6).all()


def test_wbc_trot_mode(wbc_setup):
    """With two feet in swing the WBC keeps swing forces at zero."""
    model, cfg, x0, rbd = wbc_setup
    flags = jnp.asarray([1.0, 0.0, 0.0, 1.0])  # LF_RH stance
    u_des = centroidal.weight_compensating_input(model, flags)
    cmd, _ = hierarchical_wbc(
        model, cfg.wbc, x0, u_des, rbd, flags,
        WbcState.init(), 0.002, use_arm_init=False, qp_iters=40,
    )
    F = np.asarray(cmd[24:36]).reshape(4, 3)
    np.testing.assert_allclose(F[[1, 2]], 0.0, atol=1e-6)
    # stance feet z-forces positive and supporting the weight
    m_tot = float(jnp.sum(model.body_mass))
    assert F[[0, 3], 2].min() > 0.0
    np.testing.assert_allclose(F[[0, 3], 2].sum(), m_tot * GRAVITY, rtol=0.3)


def test_wbc_separated_variant(wbc_setup):
    """HierarchicalMpcWbc stack solves and matches force tracking in stance."""
    from qm_door_tpu.wbc.wbc import hierarchical_mpc_wbc

    model, cfg, x0, rbd = wbc_setup
    flags = jnp.ones(4)
    u_des = _moment_balanced_input(model, x0)
    cmd, _ = hierarchical_mpc_wbc(
        model, cfg.wbc, x0, u_des, rbd, flags, WbcState.init(), 0.002, qp_iters=40
    )
    F = np.asarray(cmd[24:36])
    np.testing.assert_allclose(F, np.asarray(u_des[:12]), atol=2.0)
    tau = np.asarray(cmd[36:54])
    assert (np.abs(tau) <= np.asarray(model.effort_limit) + 1e-6).all()


def test_wbc_batched_vmap(wbc_setup):
    """The WBC tick vmaps over a scenario batch."""
    import jax

    model, cfg, x0, rbd = wbc_setup
    flags = jnp.ones(4)
    u_des = _moment_balanced_input(model, x0)
    B = 3
    xs = jnp.tile(x0[None], (B, 1))
    us = jnp.tile(u_des[None], (B, 1))
    rbds = jnp.tile(rbd[None], (B, 1))
    flagss = jnp.tile(flags[None], (B, 1))

    def one(x, u, r, f):
        cmd, _ = hierarchical_wbc(
            model, cfg.wbc, x, u, r, f, WbcState.init(), 0.002,
            use_arm_init=False, qp_iters=25,
        )
        return cmd

    cmds = jax.vmap(one)(xs, us, rbds, flagss)
    assert cmds.shape == (B, 54)
    np.testing.assert_allclose(cmds[0], cmds[1], atol=1e-9)


def test_nullspace_backends_equivalent(wbc_setup):
    """Projector-based and SVD-based hierarchy solves agree."""
    from qm_door_tpu.wbc import tasks as Tm
    from qm_door_tpu.wbc.hoqp import solve_hierarchy

    model, cfg, x0, rbd = wbc_setup
    for fl in ([1.0, 1.0, 1.0, 1.0], [1.0, 0.0, 0.0, 1.0]):
        flags = jnp.asarray(fl)
        u_des = centroidal.weight_compensating_input(model, flags)
        data = Tm.build_wbc_data(model, x0, u_des, rbd, flags, jnp.zeros(30), 0.002)
        t0 = Tm.concat_tasks(
            Tm.floating_base_eom_task(data), Tm.torque_limits_task(data),
            Tm.no_contact_motion_task(data), Tm.friction_cone_task(data, 0.3),
        )
        t1 = Tm.concat_tasks(
            Tm.base_height_motion_task(data, 400.0, 140.0),
            Tm.base_angular_motion_task(data, 400.0, 140.0),
            Tm.scale_task(Tm.swing_leg_task(data, 350.0, 37.0), 100.0),
        )
        t2 = Tm.contact_force_task(data)
        x_p = solve_hierarchy([t0, t1, t2], qp_iters=40, nullspace="projector")
        x_s = solve_hierarchy([t0, t1, t2], qp_iters=40, nullspace="svd")
        # The raw solutions may differ in directions no task pins (degenerate
        # optimum); what must agree are the task residuals and feasibility.
        for t in (t0, t1, t2):
            rp = float(jnp.linalg.norm(t.A @ x_p - t.b))
            rs = float(jnp.linalg.norm(t.A @ x_s - t.b))
            assert abs(rp - rs) < 1e-3, (rp, rs)
        assert float(jnp.max(t0.D @ x_p - t0.f)) < 1e-6
        assert float(jnp.max(t0.D @ x_s - t0.f)) < 1e-6
        # contact forces (pinned by t2) must match
        np.testing.assert_allclose(np.asarray(x_p[24:]), np.asarray(x_s[24:]), atol=1e-2)


@pytest.mark.parametrize("flags_list,label", [
    ([0.0, 0.0, 0.0, 0.0], "flight"),
    ([1.0, 0.0, 0.0, 0.0], "one_contact"),
    ([1.0, 0.0, 0.0, 1.0], "two_contact"),
])
@pytest.mark.parametrize("dtype", ["f64", "f32"])
def test_wbc_rank_edges(wbc_setup, flags_list, label, dtype):
    """Hierarchy at 0/1/2-contact modes (flight phase of flying_trot/pace):
    task-0 rank = 6 + 3c varies most here and the Cholesky null projector's
    ridge must stay well-posed — in f32 as deployed on TPU as well as f64.
    Asserts the physical KKT content of the solution: EoM equality residual,
    swing-force zeroing, torque limits, finite outputs."""
    from qm_door_tpu.models import kinematics

    from qm_door_tpu.models import aliengo_z1

    model, cfg, x0, rbd = wbc_setup
    dt = jnp.float32 if dtype == "f32" else jnp.float64
    if dtype == "f32":
        model = aliengo_z1(dtype=jnp.float32)
    flags = jnp.asarray(flags_list, dtype=dt)
    u_des = centroidal.weight_compensating_input(model, flags).astype(dt)
    if label == "flight":
        u_des = jnp.zeros(30, dtype=dt)
    cmd, _ = hierarchical_wbc(
        model, cfg.wbc, x0.astype(dt), u_des, rbd.astype(dt), flags,
        WbcState.init(dtype=dt), 0.002, use_arm_init=False, qp_iters=40,
    )
    cmd = np.asarray(cmd, dtype=np.float64)
    assert np.isfinite(cmd).all(), label
    qdd, F, tau = cmd[:24], cmd[24:36], cmd[36:54]

    # swing feet carry ~zero force (f32: roundoff relative to |F| ~ 2e2)
    swing = np.repeat(1.0 - np.asarray(flags_list), 3)
    np.testing.assert_allclose(
        swing * F, 0.0, atol=0.3 if dtype == "f32" else 1e-6)

    # floating-base EoM rows (the rank-6 core of task 0) must balance to
    # roundoff RELATIVE to the term magnitudes (one-contact solutions carry
    # |qdd| ~ 80 rad/s^2, so absolute residuals scale with ~1e3 N terms)
    q0 = centroidal.pinocchio_q(x0)
    M = np.asarray(dynamics.mass_matrix(model, q0), dtype=np.float64)
    h = np.asarray(
        dynamics.nonlinear_effects(model, q0, jnp.zeros_like(q0)),
        dtype=np.float64,
    )
    Jc = np.asarray(
        kinematics.frame_jacobians(model, q0, model.contact_frame_ids)[:, :3, :],
        dtype=np.float64,
    ).reshape(12, 24)
    scale = max(
        1.0, np.abs(M @ qdd).max(), np.abs(h).max(), np.abs(Jc.T @ F).max()
    )
    # f32 gate: the PDIP hierarchy converges to ~1.6e-3 relative KKT residual
    # at 40 iterations in f32 (measured, one-contact); a rank collapse would
    # show as O(1) relative. f64 is roundoff-limited.
    rtol = 5e-3 if dtype == "f32" else 1e-8
    resid_base = (M @ qdd + h - Jc.T @ F)[:6]
    assert np.abs(resid_base).max() < rtol * scale, (label, resid_base, scale)

    # joint rows balance with the recovered torques
    resid_j = (M @ qdd + h - Jc.T @ F)[6:] - tau
    assert np.abs(resid_j).max() < rtol * scale, (label, resid_j, scale)

    # torque limits (task-0 inequalities)
    assert (np.abs(tau) <= np.asarray(model.effort_limit) + 1e-3).all(), label

    # friction cones for stance feet
    mu = cfg.wbc.friction_coefficient
    Fm = F.reshape(4, 3)
    for i, fl in enumerate(flags_list):
        if fl > 0.5:
            assert Fm[i, 2] >= -1e-6, label
            assert np.abs(Fm[i, 0]) <= mu * Fm[i, 2] + 1e-3, label
            assert np.abs(Fm[i, 1]) <= mu * Fm[i, 2] + 1e-3, label
