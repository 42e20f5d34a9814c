"""Linear Kalman filter fusing IMU and leg odometry (pure JAX, vmappable).

The reference snapshot ships only the ground-truth estimator (see
qm_estimation/FromTopiceEstimate.cpp and SURVEY.md §2); its README cites the
standard legged-robot linear KF [Bloesch et al. / OCS2 legged examples] as
the framework's estimator. This implements that filter TPU-first: fixed
shapes, one fused predict+update step, jit/vmap friendly, so a batch of
robots can be estimated in one call.

Filter state xe (18) = [p_base(3); v_base(3); p_foot LF,RF,LH,RH (12)],
world frame. Orientation and angular velocity are taken from the IMU
directly (not filtered), as in the classic linear design.

Model:
  predict: p' = p + dt v + 0.5 dt^2 a_w ;  v' = v + dt a_w ; feet constant,
           with swing feet given large process noise so they re-lock at
           touchdown.
  measure (28): per foot i
    - relative position (3):  p_f_i - p_base  =  R_wb fk_rel_i(q_j)
    - base velocity (3):      v_base          = -(omega x r_i + R J_rel qdot)
    - foot height (1):        p_f_i[z]        =  terrain height
  with stance/swing gating through the measurement covariance.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..models import kinematics, spatial
from ..models.model import RobotModel, GRAVITY
from .base import assemble_rbd

NXE = 18
NY = 28


class KfParams(NamedTuple):
    """Noise configuration (legged_control kalmanFilter defaults scale)."""

    process_position: float = 0.02
    process_velocity: float = 0.02
    process_foot: float = 0.002
    sensor_rel_position: float = 0.005
    sensor_velocity: float = 0.1
    sensor_foot_height: float = 0.01
    swing_inflation: float = 1e4   # multiplies noise for swing-foot rows
    init_cov: float = 0.1
    # Per-foot slip gate on the leg-odometry VELOCITY rows (round-5 KF-trot
    # root cause, docs/ROADMAP.md): the velocity measurement assumes stance
    # feet are stationary, but a creeping/sliding stance foot (tangential
    # load on the creep-friction plant, ~F_t/c m/s) injects that slip as
    # phantom base velocity — +-0.24 m/s spikes at gait transitions in the
    # recorded traces. A foot whose predicted velocity innovation exceeds
    # ``slip_gate`` m/s gets its 3 velocity rows inflated by
    # ~(|r|/gate - 1) * slip_inflation, so gross slip is soft-rejected
    # while clean stance (innovation ~sigma) is untouched.
    #
    # DEFAULT OFF (0 disables), shipped as a validated option like the
    # stiction anchor: measured trade-off (scratch r5 gate sweep) — with
    # gate 0.15/infl 200 a 0.3 m/s sliding foot drags the base-velocity
    # estimate 0.0005 m/s instead of 0.075, but the settle-impact transient
    # (where leg odometry is the CORRECTION for bad IMU integration and
    # every foot's innovation is large common-mode) degrades 0.11 -> 0.17
    # m/s peak. Enable for slip-prone plants
    # (ClosedLoopRunner(kf_params=KfParams(slip_gate=0.15))).
    slip_gate: float = 0.0
    slip_inflation: float = 200.0


@struct.dataclass
class KfState:
    xe: jnp.ndarray  # (18,)
    P: jnp.ndarray   # (18,18)


def _h_matrix(dtype):
    """Constant measurement matrix H (28, 18)."""
    H = np.zeros((NY, NXE))
    for i in range(4):
        # relative foot position rows: p_f_i - p
        H[3 * i : 3 * i + 3, 0:3] = -np.eye(3)
        H[3 * i : 3 * i + 3, 6 + 3 * i : 9 + 3 * i] = np.eye(3)
        # base velocity rows
        H[12 + 3 * i : 15 + 3 * i, 3:6] = np.eye(3)
        # foot height rows
        H[24 + i, 6 + 3 * i + 2] = 1.0
    return jnp.asarray(H, dtype=dtype)


def kf_init(model: RobotModel, q0, params: KfParams = KfParams()) -> KfState:
    """Initialize from a configuration: base pose + FK foot positions."""
    dtype = q0.dtype
    p_feet = kinematics.contact_positions(model, q0).reshape(12)
    xe = jnp.concatenate([q0[0:3], jnp.zeros(3, dtype=dtype), p_feet])
    P = params.init_cov * jnp.eye(NXE, dtype=dtype)
    return KfState(xe=xe, P=P)


def kf_step(
    model: RobotModel,
    params: KfParams,
    state: KfState,
    zyx,
    omega_world,
    acc_body,
    qj,
    vj,
    contact_flags,
    dt,
    terrain_height=0.0,
):
    """One fused predict+update. Returns (KfState, rbd(55)).

    zyx/omega_world/acc_body: IMU readings (acc specific force, body frame);
    qj/vj: joint encoders; contact_flags: (4,) stance flags.
    """
    dtype = state.xe.dtype
    R_wb = spatial.zyx_to_rot(zyx)
    g = jnp.array([0.0, 0.0, -GRAVITY], dtype=dtype)
    a_w = spatial.fmv(R_wb, acc_body) + g

    # ---- predict -------------------------------------------------------
    xe, P = state.xe, state.P
    p = xe[0:3] + dt * xe[3:6] + 0.5 * dt * dt * a_w
    v = xe[3:6] + dt * a_w
    xe_pred = jnp.concatenate([p, v, xe[6:18]])

    eye3 = jnp.eye(3, dtype=dtype)
    A = jnp.eye(NXE, dtype=dtype)
    A = A.at[0:3, 3:6].set(dt * eye3)

    swing = 1.0 - contact_flags  # (4,)
    foot_q = params.process_foot * (1.0 + swing * params.swing_inflation)
    Qd = jnp.concatenate(
        [
            jnp.full(3, params.process_position, dtype=dtype),
            jnp.full(3, params.process_velocity, dtype=dtype),
            jnp.repeat(foot_q, 3).astype(dtype),
        ]
    )
    P_pred = A @ P @ A.T + dt * jnp.diag(Qd)

    # ---- measurements from leg odometry -------------------------------
    # FK with base at the origin, IMU orientation: relative foot kinematics.
    q_rel = jnp.concatenate([jnp.zeros(3, dtype=dtype), zyx, qj])
    p_rel = kinematics.contact_positions(model, q_rel)            # (4,3)
    J = kinematics.frame_jacobians(model, q_rel, model.contact_frame_ids)
    # foot velocity from joints + body rotation, base translation excluded:
    # v_foot_rel = J_j qdot_j + omega x p_rel  (J columns 6: exclude base)
    v_rel = spatial.fmv(J[:, :3, 6:24], vj) + jnp.cross(
        omega_world[None, :], p_rel
    )                                                             # (4,3)
    y = jnp.concatenate(
        [
            p_rel.reshape(12),
            (-v_rel).reshape(12),
            # scalar (flat ground) or per-foot (4,) terrain heights — the
            # caller evaluates sim.terrain_height at each foot xy on
            # non-flat worlds (see sim/closed_loop.py)
            jnp.broadcast_to(jnp.asarray(terrain_height, dtype=dtype), (4,)),
        ]
    )

    swing_rows = jnp.concatenate(
        [
            jnp.repeat(swing, 3),
            jnp.repeat(swing, 3),
            swing,
        ]
    )
    Rd = jnp.concatenate(
        [
            jnp.full(12, params.sensor_rel_position, dtype=dtype),
            jnp.full(12, params.sensor_velocity, dtype=dtype),
            jnp.full(4, params.sensor_foot_height, dtype=dtype),
        ]
    ) * (1.0 + swing_rows * params.swing_inflation)

    H = _h_matrix(dtype)
    r = y - H @ xe_pred
    # slip gate (see KfParams.slip_gate): soft-reject the velocity rows of
    # feet whose innovation says they are sliding. Uses the PREDICTED
    # innovation (no circularity); smooth in r so the step stays
    # jit/vmap/AD-friendly.
    if params.slip_gate > 0.0:
        rv = r[12:24].reshape(4, 3)
        speed = jnp.sqrt(jnp.sum(rv * rv, axis=-1) + 1e-12)      # (4,)
        excess = jnp.maximum(speed / params.slip_gate - 1.0, 0.0)
        infl = 1.0 + params.slip_inflation * excess
        Rd = Rd.at[12:24].mul(jnp.repeat(infl, 3))
    S = H @ P_pred @ H.T + jnp.diag(Rd)
    K = jnp.linalg.solve(S, H @ P_pred).T           # (18, 28)
    xe_new = xe_pred + K @ r
    IKH = jnp.eye(NXE, dtype=dtype) - K @ H
    # Joseph form for covariance (symmetric PSD in f32)
    P_new = IKH @ P_pred @ IKH.T + K @ jnp.diag(Rd) @ K.T

    new_state = KfState(xe=xe_new, P=P_new)
    rbd = assemble_rbd(
        model, zyx, xe_new[0:3], omega_world, xe_new[3:6], qj, vj
    )
    return new_state, rbd


class KalmanFilterEstimate:
    """Stateful wrapper mirroring StateEstimateBase::update cadence.

    Holds (KfState, zyx offset); `update` consumes one IMU+encoder sample
    and returns rbdState(55). The functional core `kf_step` stays pure for
    batched/vmapped use."""

    def __init__(self, model: RobotModel, params: KfParams = KfParams()):
        self.model = model
        self.params = params
        self._state = None
        self._zyx_offset = None
        self._R_shift = None
        self._step = jax.jit(
            lambda st, zyx, om, acc, qj, vj, flags, dt, th: kf_step(
                model, params, st, zyx, om, acc, qj, vj, flags, dt,
                terrain_height=th,
            )
        )

    def reset(self, q0):
        # EVERY estimated quantity lives in the yaw-shifted world frame (the
        # IMU-path first-sample offset removal of StateEstimateBase.cpp:46-68
        # applied consistently): the shift is fixed here from q0's yaw, and
        # the initial base/foot positions are rotated into that frame along
        # with every world-frame input in update(). Mixing frames (shifted
        # zyx with world-frame init) measurably corrupts the transient
        # (tests/test_estimation.py::test_kf_yaw_equivariance).
        yaw0 = float(q0[3])
        self._zyx_offset = jnp.array([yaw0, 0.0, 0.0], dtype=q0.dtype)
        self._R_shift = spatial.zyx_to_rot(
            jnp.array([-yaw0, 0.0, 0.0], dtype=q0.dtype)
        )
        q0_shift = jnp.concatenate([
            spatial.fmv(self._R_shift, q0[0:3]),
            q0[3:6] - self._zyx_offset,
            q0[6:],
        ])
        self._state = kf_init(self.model, q0_shift, self.params)

    def update(self, zyx, omega_world, acc_body, qj, vj, contact_flags, dt,
               terrain_height=0.0):
        if self._state is None:
            q0 = jnp.concatenate([jnp.zeros(3, dtype=zyx.dtype), zyx, qj])
            self.reset(q0)
        zyx = zyx - self._zyx_offset
        omega_world = spatial.fmv(self._R_shift, omega_world)
        self._state, rbd = self._step(
            self._state, zyx, omega_world, acc_body, qj, vj, contact_flags,
            dt, jnp.asarray(terrain_height, dtype=zyx.dtype),
        )
        return rbd

    @property
    def state(self) -> KfState:
        return self._state
