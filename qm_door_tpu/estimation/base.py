"""Estimator base: rbdState(55) assembly + ground-truth estimator.

Replaces qm_estimation/StateEstimateBase.{h,cpp} + FromTopiceEstimate.cpp:

- rbdState layout [zyx(3); base pos(3); q_j(18); omega_world(3); v_base(3);
  qdot_j(18); ee pos(3); ee quat xyzw(4)] (StateEstimateBase.cpp:80-103).
- IMU handling removes the first-sample ZYX offset so the estimate starts
  level (StateEstimateBase.cpp:46-68).
- `mode_from_flags` reproduces StateEstimateBase.h:161 (stance-flag bitmask
  to mode number, MotionPhaseDefinition).
- `GroundTruthEstimate` = FromTopicStateEstimate: consumes perfect base
  odometry (the Gazebo p3d ground-truth topic role, FromTopiceEstimate.cpp:23-38).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models import centroidal, kinematics, spatial
from ..models.model import RobotModel


def mode_from_flags(contact_flags):
    """4-bit stance flags (LF,RF,LH,RH) -> mode number (modeNumber2StanceLeg
    inverse; ocs2_legged_robot MotionPhaseDefinition)."""
    f = jnp.asarray(contact_flags)
    weights = jnp.array([8, 4, 2, 1], dtype=jnp.int32)
    return jnp.sum((f > 0.5).astype(jnp.int32) * weights)


@jax.jit
def assemble_rbd(model: RobotModel, zyx, base_pos, omega_world, v_world, qj, vj):
    """Assemble rbdState(55) from estimated quantities + FK'd EE pose
    (StateEstimateBase::updateArmEE, StateEstimateBase.cpp:80-103)."""
    q = jnp.concatenate([base_pos, zyx, qj])
    R_ee, p_ee = kinematics.ee_pose(model, q)
    quat = spatial.rot_to_quat(R_ee)
    return jnp.concatenate([zyx, base_pos, qj, omega_world, v_world, vj, p_ee, quat])


def imu_from_state(model: RobotModel, q, v, a_w):
    """Synthesize IMU readings (zyx, omega_world, specific force in body
    frame) from ground-truth generalized state — the QMHWSim::readSim role
    (gravity-compensated accelerometer, QMHWSim.cpp:48-69)."""
    from ..models.model import GRAVITY

    zyx = q[3:6]
    R = spatial.zyx_to_rot(zyx)
    g = jnp.array([0.0, 0.0, -GRAVITY], dtype=q.dtype)
    acc_body = spatial.fmv(R.T, a_w - g)
    omega_w = spatial.zyx_rates_to_world_angvel(zyx, v[3:6])
    return zyx, omega_w, acc_body


class GroundTruthEstimate:
    """FromTopicStateEstimate equivalent: perfect base odometry in, rbd out.

    The reference subscribes /ground_truth/state (Gazebo p3d, 1 kHz) and
    copies pose/twist into rbdState *without* any offset removal
    (FromTopiceEstimate.cpp:23-38 — the first-sample ZYX offset belongs to
    the IMU path only, StateEstimateBase.cpp:46-68); applying it here while
    leaving base_pos/v_world/omega_world unrotated would mix frames for a
    nonzero initial yaw."""

    def __init__(self, model: RobotModel):
        self.model = model

    def reset(self):
        pass

    def update(self, zyx, base_pos, omega_world, v_world, qj, vj):
        return assemble_rbd(
            self.model, zyx, base_pos, omega_world, v_world, qj, vj
        )

    def update_from_sim(self, sim_state):
        """Convenience: sim (q, v) -> rbd (measured_rbd equivalent)."""
        return centroidal.rbd_from_generalized(self.model, sim_state.q, sim_state.v)
