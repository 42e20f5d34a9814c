"""Target trajectories: desired-state storage + interpolation (JAX side).

Replaces ocs2 TargetTrajectories as consumed by the tracking cost and the
end-effector constraint. States carry 37 dims = 30 centroidal state + 7 EE
pose [pos(3), quat xyzw(4)] (QmTargetTrajectoriesPublisher_node.cpp:76-78).

Fixed-shape pytree: K knots padded by repeating the final knot so that
interpolation clamps (matching ocs2 LinearInterpolation clamping).
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from ..models import spatial


@struct.dataclass
class TargetTrajectories:
    times: jnp.ndarray   # (K,)
    states: jnp.ndarray  # (K, 37)
    inputs: jnp.ndarray  # (K, 30)

    @staticmethod
    def create(times, states, inputs, max_knots: int = 8):
        """Build a padded TargetTrajectories from arrays of <= max_knots rows."""
        times = jnp.asarray(times)
        states = jnp.asarray(states)
        inputs = jnp.asarray(inputs)
        k = times.shape[0]
        pad = max_knots - k
        if pad < 0:
            raise ValueError(f"too many knots ({k} > {max_knots})")
        if pad:
            times = jnp.concatenate([times, jnp.full((pad,), times[-1]) + 1e6])
            states = jnp.concatenate([states, jnp.tile(states[-1:], (pad, 1))])
            inputs = jnp.concatenate([inputs, jnp.tile(inputs[-1:], (pad, 1))])
        return TargetTrajectories(times=times, states=states, inputs=inputs)

    def _segment(self, t):
        """(index, alpha) with alpha the weight of the left knot (ocs2
        LinearInterpolation::timeSegment semantics, clamped)."""
        K = self.times.shape[0]
        idx = jnp.clip(jnp.searchsorted(self.times, t, side="right") - 1, 0, K - 2)
        t0 = self.times[idx]
        t1 = self.times[idx + 1]
        denom = jnp.where(jnp.abs(t1 - t0) < 1e-12, 1.0, t1 - t0)
        alpha = jnp.clip(1.0 - (t - t0) / denom, 0.0, 1.0)
        return idx, alpha

    def desired_state(self, t):
        """Linear interpolation of the full 37-dim desired state."""
        idx, alpha = self._segment(t)
        return alpha * self.states[idx] + (1.0 - alpha) * self.states[idx + 1]

    def ee_pose(self, t):
        """(position, quaternion) of the desired EE pose: lerp + slerp
        (EndEffectorConstraint::interpolateEndEffectorPose)."""
        idx, alpha = self._segment(t)
        lhs = self.states[idx, 30:37]
        rhs = self.states[idx + 1, 30:37]
        pos = alpha * lhs[:3] + (1.0 - alpha) * rhs[:3]
        quat = spatial.quat_slerp(lhs[3:], rhs[3:], 1.0 - alpha)
        return pos, quat
