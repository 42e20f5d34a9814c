"""Force-tracking NMPC extension (BASELINE config #4).

Validates the input widening u 30->36 (EE wrench as a 5th contact, the
reference's force-tracking branch design — README.md 'three branches')
through flow map, fused linearization, projection and the SQP loop.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qm_door_tpu.config import default_config
from qm_door_tpu.models import aliengo_z1, centroidal
from qm_door_tpu.ocp import constraints as cons
from qm_door_tpu.ocp.force import (
    build_stage_data_ft,
    make_ocp_config_ft,
    weight_compensating_input_ft,
)
from qm_door_tpu.ocp.gait import GaitSchedule
from qm_door_tpu.ocp.problem import build_stage_data
from qm_door_tpu.ocp.reference import TargetTrajectories
from qm_door_tpu.solver.projection import project_node_chol_ft
from qm_door_tpu.solver import transcription as tr


@pytest.fixture(scope="module")
def ft_setup(model):
    from qm_door_tpu.models import kinematics, spatial

    cfg = default_config()
    ocp = make_ocp_config_ft(model, cfg)
    x0 = jnp.asarray(cfg.initial_state())
    R_ee, p_ee = kinematics.ee_pose(model, x0[6:30])
    quat = spatial.rot_to_quat(R_ee)
    tstate = jnp.concatenate([x0, p_ee, quat])
    targets = TargetTrajectories.create(
        jnp.array([0.0, 1e5]), jnp.stack([tstate, tstate]), jnp.zeros((2, 30))
    )
    return cfg, ocp, x0, targets


def _ft_stage(model, cfg, targets, horizon, wrench_ref, grasp_from=0.0):
    sched = GaitSchedule()  # stance
    stage = build_stage_data(
        model, cfg, sched, targets, 0.0, horizon=horizon
    )
    from qm_door_tpu.ocp.force import widen_stage_data

    grasp = (np.asarray(stage.times) >= grasp_from).astype(float)
    wref = np.tile(np.asarray(wrench_ref), (stage.times.shape[0], 1))
    return widen_stage_data(stage, grasp, wref)


def test_flow_map_ft_zero_wrench_matches(model, rng):
    x = jnp.asarray(default_config().initial_state())
    u30 = jnp.asarray(rng.normal(size=30))
    u36 = jnp.concatenate([u30, jnp.zeros(6)])
    np.testing.assert_allclose(
        centroidal.flow_map_ft(model, x, u36),
        centroidal.flow_map(model, x, u30),
        rtol=1e-12, atol=1e-12,
    )


def test_flow_map_ft_wrench_effect(model, rng):
    """The wrench enters the momentum rates with the documented lever arm."""
    from qm_door_tpu.models import dynamics, kinematics

    x = jnp.asarray(default_config().initial_state())
    u36 = jnp.concatenate([jnp.asarray(rng.normal(size=30)), jnp.zeros(6)])
    W = jnp.asarray(rng.normal(size=6))
    f0 = centroidal.flow_map_ft(model, x, u36)
    f1 = centroidal.flow_map_ft(model, x, u36.at[30:36].set(W))
    m = float(jnp.sum(model.body_mass))
    q = x[6:30]
    _, p_ee = kinematics.ee_pose(model, q)
    com = dynamics.com_position(model, q)
    dlin = W[0:3] / m
    dang = (jnp.cross(p_ee - com, W[0:3]) + W[3:6]) / m
    np.testing.assert_allclose(f1[0:3] - f0[0:3], dlin, atol=1e-12)
    np.testing.assert_allclose(f1[3:6] - f0[3:6], dang, atol=1e-12)
    np.testing.assert_allclose(f1[6:], f0[6:], atol=1e-12)


def test_ft_linearization_matches_reference(model, ft_setup, rng):
    """Fused 24-tangent path == independent-AD reference path at nu = 36."""
    cfg, ocp, x0, targets = ft_setup
    stage = _ft_stage(model, cfg, targets, 0.06, [5.0, -3.0, -10.0, 0.5, 0.0, -1.0])
    dt = cfg.sqp.dt
    k = 2
    x = x0 + 0.01 * jnp.asarray(rng.normal(size=30))
    u = jnp.concatenate([
        centroidal.weight_compensating_input(model, stage.contact_flags[k]),
        jnp.asarray([4.0, -2.0, -8.0, 0.3, 0.1, -0.7]),
    ]) + 0.01 * jnp.asarray(rng.normal(size=36))
    x_next = x + 0.001 * jnp.asarray(rng.normal(size=30))

    ref = tr._node_linearization_reference(model, ocp, stage, dt, k, x, u, x_next)
    fused = tr._node_linearization(model, ocp, stage, dt, k, x, u, x_next)
    names = "A B d l lx lu lxx luu lux g0 Gx Gv".split()
    for nm, a, b in zip(names, fused, ref):
        np.testing.assert_allclose(a, b, rtol=1e-8, atol=1e-9, err_msg=nm)


def test_ft_projection_pins_and_frees_wrench(model, rng):
    flags = jnp.asarray([1.0, 1.0, 1.0, 1.0])
    g0 = jnp.asarray(rng.normal(size=12))
    Gx = jnp.asarray(rng.normal(size=(12, 30)))
    Gv = jnp.asarray(rng.normal(size=(12, 18)))
    F_bar = jnp.asarray(rng.normal(size=12))
    W_bar = jnp.asarray(rng.normal(size=6))

    for grasp, expect_pin in ((jnp.asarray(0.0), True), (jnp.asarray(1.0), False)):
        p, Pu, Px, reg = project_node_chol_ft(
            flags, grasp, F_bar, W_bar, g0, Gx, Gv, shift=1e-9
        )
        u_red = jnp.asarray(rng.normal(size=36))
        dx = jnp.asarray(rng.normal(size=30))
        du = p + Pu @ u_red + Px @ dx
        if expect_pin:
            np.testing.assert_allclose(du[30:36], -W_bar, atol=1e-12)
        else:
            np.testing.assert_allclose(du[30:36], u_red[30:36], atol=1e-12)
        # velocity equality rows still hold after the substitution
        resid = g0 + Gx @ dx + Gv @ du[12:30]
        np.testing.assert_allclose(resid, np.zeros(12), atol=1e-8)


def test_ft_sqp_tracks_wrench(model, ft_setup):
    """Standing solve with a grasped wrench reference: off-grasp nodes carry
    exactly zero wrench; grasped nodes track the reference while the feet
    compensate; dynamics stay feasible."""
    from qm_door_tpu.solver.sqp import SqpSolver

    cfg, ocp, x0, targets = ft_setup
    cfg2 = default_config()
    cfg2.mpc.time_horizon = 0.3
    cfg2.sqp.sqp_iterations = 8
    solver = SqpSolver(model, ocp, cfg2)

    W_ref = np.array([8.0, 0.0, -15.0, 0.0, 0.0, 1.0])
    stage = _ft_stage(model, cfg2, targets, 0.3, W_ref, grasp_from=0.1)
    X0 = jnp.tile(x0[None], (solver.n_intervals + 1, 1))
    U0 = jax.vmap(
        lambda f: weight_compensating_input_ft(model, f, dtype=x0.dtype)
    )(stage.contact_flags[: solver.n_intervals])
    sol = solver._solve(stage, x0, X0, U0)

    # converged: step_size of the LAST iteration may be 0 (filter rejects
    # further steps at the optimum) — feasibility is the convergence signal
    assert float(sol.constraint_violation) < 1e-4
    grasp = np.asarray(stage.grasp_flags[: solver.n_intervals])
    U = np.asarray(sol.U)
    off = U[grasp < 0.5][:, 30:36]
    on = U[grasp > 0.5][:, 30:36]
    np.testing.assert_allclose(off, 0.0, atol=1e-8)
    assert on.shape[0] > 3
    # tracks the reference within 10% of its magnitude (soft tracking: the
    # optimizer keeps the freedom to trade force against state cost)
    err = np.abs(on - W_ref[None, :]).max()
    assert err < 0.1 * np.abs(W_ref).max(), (on.mean(axis=0), W_ref)


def _spawn_rbd(model, cfg):
    from qm_door_tpu.models import kinematics

    x0 = jnp.asarray(cfg.initial_state(), dtype=jnp.float64)
    rbd = np.zeros(55)
    rbd[3:6] = np.asarray(x0[6:9])
    rbd[6:24] = np.asarray(x0[12:30])
    _, p_ee = kinematics.ee_pose(model, x0[6:30])
    rbd[48:51] = np.asarray(p_ee)
    rbd[54] = 1.0  # identity quat (w last)
    return x0, jnp.asarray(rbd)


def test_wbc_wrench_priority_pins_external_wrench(model):
    """The wrench-tracking equality at priority 0 (wbc/force.py default) pins
    W to the commanded grasp wrench: an external force is a fact of the world,
    not a decision variable the motion levels may spend. The legacy level-2
    slot measurably lets the top levels absorb a phantom wrench (the round-2
    door-demo diagnosis: press/push MPC violations 1e-1 vs 1e-10 pinned)."""
    from qm_door_tpu.wbc.force import hierarchical_wbc_ft
    from qm_door_tpu.wbc.wbc import WbcGains, WbcState

    cfg = default_config()
    gains = WbcGains.from_settings(cfg.wbc, dtype=jnp.float64)
    x0, rbd = _spawn_rbd(model, cfg)
    wref = jnp.array([20.0, 0.0, -30.0, 0.0, 0.0, 0.0])
    u = jnp.zeros(36, dtype=jnp.float64)
    u = u.at[:12].set(centroidal.weight_compensating_input(model, jnp.ones(4))[:12])
    u = u.at[30:36].set(wref)
    st = WbcState.init(jnp.float64, nu=36)

    cmd0, _ = hierarchical_wbc_ft(
        model, gains, x0, u, rbd, jnp.ones(4), 1.0, st, 0.002, wrench_priority=0)
    cmd2, _ = hierarchical_wbc_ft(
        model, gains, x0, u, rbd, jnp.ones(4), 1.0, st, 0.002, wrench_priority=2)

    err0 = float(jnp.abs(cmd0[36:42] - wref).max())
    err2 = float(jnp.abs(cmd2[36:42] - wref).max())
    assert err0 < 1e-5, err0          # pinned: W == grasp * W_mpc
    assert err2 > 1.0, err2           # legacy slot leaves a phantom wrench

    # off-grasp the pinned wrench is exactly zero
    cmd_off, _ = hierarchical_wbc_ft(
        model, gains, x0, u, rbd, jnp.ones(4), 0.0, st, 0.002, wrench_priority=0)
    assert float(jnp.abs(cmd_off[36:42]).max()) < 1e-6

    # and the EoM stays satisfied with the pinned wrench: the floating-base
    # rows' residual with the returned (qdd, F, W) is numerically zero
    from qm_door_tpu.wbc import tasks as T
    from qm_door_tpu.wbc.force import floating_base_eom_task_ft

    data = T.build_wbc_data(model, x0, u, rbd, jnp.ones(4), st.input_last, 0.002)
    eom = floating_base_eom_task_ft(data)
    res = eom.A @ cmd0[:42] - eom.b
    assert float(jnp.abs(res).max()) < 1e-6, res
