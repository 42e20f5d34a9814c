"""Estimation layer tests: rbd assembly, ground-truth estimator parity,
linear KF convergence (static) and tracking (dynamic, sim-in-the-loop)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qm_door_tpu.config import default_config
from qm_door_tpu.estimation import (
    GroundTruthEstimate,
    KalmanFilterEstimate,
    KfParams,
    assemble_rbd,
    mode_from_flags,
)
from qm_door_tpu.estimation.kalman import kf_init, kf_step
from qm_door_tpu.models import aliengo_z1, centroidal, kinematics, spatial
from qm_door_tpu.models.model import GRAVITY
from qm_door_tpu.sim.sim import SimConfig, sim_init, sim_step


@pytest.fixture(scope="module")
def model64():
    return aliengo_z1(dtype=jnp.float64)


def test_mode_from_flags():
    assert int(mode_from_flags(jnp.array([1.0, 1, 1, 1]))) == 15  # STANCE
    assert int(mode_from_flags(jnp.array([0.0, 0, 0, 0]))) == 0   # FLY
    assert int(mode_from_flags(jnp.array([1.0, 0, 0, 1]))) == 9   # LF_RH


def test_assemble_rbd_matches_generalized(model64):
    model = model64
    rng = np.random.default_rng(3)
    cfg = default_config()
    x0 = jnp.asarray(cfg.initial_state(), dtype=jnp.float64)
    q = centroidal.pinocchio_q(x0) + 0.05 * rng.normal(size=24)
    v = jnp.asarray(0.1 * rng.normal(size=24))
    rbd_ref = centroidal.rbd_from_generalized(model, q, v)
    omega_w = spatial.zyx_rates_to_world_angvel(q[3:6], v[3:6])
    rbd = assemble_rbd(model, q[3:6], q[0:3], omega_w, v[0:3], q[6:24], v[6:24])
    np.testing.assert_allclose(np.asarray(rbd), np.asarray(rbd_ref), atol=1e-12)


def test_ground_truth_estimator(model64):
    model = model64
    cfg = default_config()
    x0 = jnp.asarray(cfg.initial_state(), dtype=jnp.float64)
    q0 = centroidal.pinocchio_q(x0)
    sim = sim_init(model, q0)
    est = GroundTruthEstimate(model)
    rbd = est.update_from_sim(sim)
    np.testing.assert_allclose(
        np.asarray(rbd),
        np.asarray(centroidal.rbd_from_generalized(model, sim.q, sim.v)),
        atol=1e-12,
    )


def _imu_from_sim(model, q, v, a_w):
    """Synthesize IMU readings from sim truth: specific force in body frame."""
    zyx = q[3:6]
    R = spatial.zyx_to_rot(zyx)
    g = jnp.array([0.0, 0.0, -GRAVITY], dtype=q.dtype)
    acc_body = spatial.fmv(R.T, a_w - g)
    omega_w = spatial.zyx_rates_to_world_angvel(zyx, v[3:6])
    return zyx, omega_w, acc_body


def test_kf_static_convergence(model64):
    model = model64
    """Standing still with a 5 cm initial position error: the filter pulls the
    base estimate back onto the leg-odometry solution."""
    cfg = default_config()
    x0 = jnp.asarray(cfg.initial_state(), dtype=jnp.float64)
    q0 = centroidal.pinocchio_q(x0)
    # put feet exactly at terrain height 0
    feet_z = float(jnp.mean(kinematics.contact_positions(model, q0)[:, 2]))
    q0 = q0.at[2].add(-feet_z)

    params = KfParams()
    st = kf_init(model, q0, params)
    st = st.replace(xe=st.xe.at[0:3].add(jnp.array([0.05, -0.05, 0.05])))

    zyx, omega_w, acc_body = _imu_from_sim(
        model, q0, jnp.zeros(24, dtype=q0.dtype), jnp.zeros(3, dtype=q0.dtype)
    )
    flags = jnp.ones(4, dtype=q0.dtype)
    dt = 0.002
    for _ in range(300):
        st, rbd = kf_step(
            model, params, st, zyx, omega_w, acc_body,
            q0[6:24], jnp.zeros(18, dtype=q0.dtype), flags, dt,
        )
    # Leg odometry observes z (terrain height rows) and the RELATIVE
    # base-foot geometry; absolute x/y is unobservable by design (it drifts
    # on a real robot too), so assert the observable quantities:
    assert abs(float(st.xe[2] - q0[2])) < 2e-3          # height
    assert float(jnp.max(jnp.abs(st.xe[3:6]))) < 5e-3   # velocity -> 0
    p_feet_true = kinematics.contact_positions(model, q0).reshape(12)
    rel_true = q0[0:3] - p_feet_true.reshape(4, 3)[0]
    rel_est = st.xe[0:3] - st.xe[6:9]
    np.testing.assert_allclose(
        np.asarray(rel_est), np.asarray(rel_true), atol=2e-3
    )
    # rbd carries the estimate
    np.testing.assert_allclose(np.asarray(rbd[3:6]), np.asarray(st.xe[0:3]))


def test_kf_slip_gate_rejects_sliding_foot(model64):
    """A stance foot whose encoders report sliding (the creep-friction
    phantom-velocity mechanism, docs/ROADMAP.md round-5 KF root cause) must
    NOT drag the base-velocity estimate when the slip gate is on: the
    innovation-gated filter soft-rejects that foot's velocity rows, while
    the ungated filter ingests the slip as phantom base velocity."""
    model = model64
    cfg = default_config()
    x0 = jnp.asarray(cfg.initial_state(), dtype=jnp.float64)
    q0 = centroidal.pinocchio_q(x0)
    feet_z = float(jnp.mean(kinematics.contact_positions(model, q0)[:, 2]))
    q0 = q0.at[2].add(-feet_z)

    # LF leg encoders consistent with the foot sliding at 0.3 m/s in +x
    # (base truly stationary): vj_leg = J_LF_legcols^+ v_slide
    J_lf = kinematics.frame_jacobians(
        model, q0, model.contact_frame_ids)[0, :3, 6:9]
    v_slide = jnp.array([0.3, 0.0, 0.0], dtype=q0.dtype)
    vj_leg = jnp.linalg.lstsq(J_lf, v_slide)[0]
    vj = jnp.zeros(18, dtype=q0.dtype).at[0:3].set(vj_leg)

    zyx, omega_w, acc_body = _imu_from_sim(
        model, q0, jnp.zeros(24, dtype=q0.dtype), jnp.zeros(3, dtype=q0.dtype)
    )
    flags = jnp.ones(4, dtype=q0.dtype)
    dt = 0.002

    speeds = {}
    for name, params in [
        ("gated", KfParams(slip_gate=0.15, slip_inflation=200.0)),
        ("ungated", KfParams()),  # default: gate off
    ]:
        st = kf_init(model, q0, params)
        for _ in range(200):
            st, _ = kf_step(
                model, params, st, zyx, omega_w, acc_body,
                q0[6:24], vj, flags, dt,
            )
        speeds[name] = float(jnp.linalg.norm(st.xe[3:6]))

    # the sliding foot says "base moves at -0.3/4 m/s-ish"; the gate must
    # keep the estimate an order of magnitude closer to the truth (0)
    assert speeds["gated"] < 0.02, speeds
    assert speeds["ungated"] > 4 * speeds["gated"], speeds


def test_kf_tracks_sim_settle(model64):
    model = model64
    """PD-hold settle in the contact sim: the KF (fed only IMU + encoders +
    contact flags) tracks the sim-truth base position/velocity."""
    cfg = default_config()
    x0 = jnp.asarray(cfg.initial_state(), dtype=jnp.float64)
    q0 = centroidal.pinocchio_q(x0)
    feet_z = float(jnp.mean(kinematics.contact_positions(model, q0)[:, 2]))
    q0 = q0.at[2].add(-feet_z + 0.005)  # small drop to make it dynamic
    sim_cfg = SimConfig()
    sim = sim_init(model, q0, cfg=sim_cfg)

    kp = jnp.full(18, 150.0, dtype=q0.dtype)
    kd = jnp.full(18, 4.0, dtype=q0.dtype)
    command = jnp.stack(
        [q0[6:24], jnp.zeros(18, dtype=q0.dtype), kp, kd,
         jnp.zeros(18, dtype=q0.dtype)]
    )

    est = KalmanFilterEstimate(model, KfParams())
    est.reset(q0)
    dt = sim_cfg.dt
    v_prev = sim.v
    max_perr = 0.0
    max_verr = 0.0
    for step in range(400):
        sim = sim_step(model, sim_cfg, sim, command)
        a_w = (sim.v[0:3] - v_prev[0:3]) / dt
        v_prev = sim.v
        zyx, omega_w, acc_body = _imu_from_sim(model, sim.q, sim.v, a_w)
        flags = jnp.ones(4, dtype=q0.dtype)
        rbd = est.update(
            zyx, omega_w, acc_body, sim.q[6:24], sim.v[6:24], flags, dt
        )
        if step > 50:  # let the filter lock in
            max_perr = max(max_perr, float(jnp.max(jnp.abs(rbd[3:6] - sim.q[0:3]))))
            max_verr = max(max_verr, float(jnp.max(jnp.abs(rbd[27:30] - sim.v[0:3]))))
    assert max_perr < 0.02, max_perr
    assert max_verr < 0.15, max_verr


def test_kf_yaw_equivariance(model64):
    """Nonzero initial yaw: rotating the whole scenario by yaw0 must leave
    the estimate (expressed in the filter's yaw-shifted frame) unchanged —
    the regression test for the first-sample offset removal: zyx,
    omega_world, and the leg-odometry cross products must all live in ONE
    frame (StateEstimateBase.cpp:46-68 semantics)."""
    model = model64
    cfg = default_config()
    x0 = jnp.asarray(cfg.initial_state(), dtype=jnp.float64)
    q0 = centroidal.pinocchio_q(x0)
    feet_z = float(jnp.mean(kinematics.contact_positions(model, q0)[:, 2]))
    q0 = q0.at[2].add(-feet_z + 0.005)
    sim_cfg = SimConfig()
    sim = sim_init(model, q0, cfg=sim_cfg)
    kp = jnp.full(18, 150.0, dtype=q0.dtype)
    kd = jnp.full(18, 4.0, dtype=q0.dtype)
    command = jnp.stack(
        [q0[6:24], jnp.zeros(18, dtype=q0.dtype), kp, kd,
         jnp.zeros(18, dtype=q0.dtype)]
    )

    yaw0 = 1.2
    Rz = spatial.zyx_to_rot(jnp.array([yaw0, 0.0, 0.0], dtype=q0.dtype))
    est_a = KalmanFilterEstimate(model, KfParams())
    est_b = KalmanFilterEstimate(model, KfParams())
    est_a.reset(q0)
    q0b = q0.at[0:3].set(spatial.fmv(Rz, q0[0:3])).at[3].add(yaw0)
    est_b.reset(q0b)

    dt = sim_cfg.dt
    v_prev = sim.v
    flags = jnp.ones(4, dtype=q0.dtype)
    rbd_a = rbd_b = None
    for _ in range(120):
        sim = sim_step(model, sim_cfg, sim, command)
        a_w = (sim.v[0:3] - v_prev[0:3]) / dt
        v_prev = sim.v
        zyx, omega_w, acc_body = _imu_from_sim(model, sim.q, sim.v, a_w)
        rbd_a = est_a.update(
            zyx, omega_w, acc_body, sim.q[6:24], sim.v[6:24], flags, dt
        )
        # the same physical motion, world frame rotated by yaw0:
        zyx_b = zyx.at[0].add(yaw0)
        rbd_b = est_b.update(
            zyx_b, spatial.fmv(Rz, omega_w), acc_body,
            sim.q[6:24], sim.v[6:24], flags, dt,
        )
    # both filters remove their first-sample yaw -> identical shifted-frame
    # estimates (zyx, v, omega, EE pose); positions differ by the rotated
    # initial base position only
    np.testing.assert_allclose(np.asarray(rbd_b[0:3]), np.asarray(rbd_a[0:3]),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(rbd_b[24:30]),
                               np.asarray(rbd_a[24:30]), atol=1e-6)
    off_a = np.asarray(rbd_a[3:6]) - np.asarray(q0[0:3])
    off_b = np.asarray(rbd_b[3:6]) - np.asarray(q0b[0:3])
    np.testing.assert_allclose(off_b, off_a, atol=1e-6)


@pytest.mark.slow
def test_closed_loop_with_kalman_estimator(mpc_stack):
    """Full stack driven by the KF estimate instead of ground truth: the
    stance hold stays safe and upright with estimator-in-the-loop."""
    from qm_door_tpu.ocp.reference import TargetTrajectories
    from qm_door_tpu.sim.closed_loop import ClosedLoopRunner

    mdl, cfg0, ocp, solver, x0, targets = mpc_stack
    cfg = default_config()
    cfg.controller.leg_pd_start_time = -1.0
    cfg.wbc.arm_init_time = -1.0
    runner = ClosedLoopRunner(mdl, cfg, solver=solver, estimator="kalman")
    log = runner.run(targets, duration=0.4)
    assert log.safe
    base = np.stack(log.base_pose)
    assert 0.33 < base[-1, 2] < 0.44
    assert np.abs(base[:, 4:6]).max() < 0.25
