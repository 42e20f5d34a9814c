"""State estimation layer (replaces qm_estimation).

- :mod:`base` — rbdState assembly, IMU offset handling, mode from contact
  flags, and the ground-truth estimator (FromTopicStateEstimate parity —
  the only estimator present in the reference snapshot).
- :mod:`kalman` — linear Kalman filter fusing IMU and leg odometry (the
  README's cited estimator [1]; the snapshot itself ships only the
  ground-truth topic estimator, see SURVEY.md §2 FromTopicStateEstimate).
"""
from .base import GroundTruthEstimate, mode_from_flags, assemble_rbd
from .kalman import KalmanFilterEstimate, KfParams, KfState

__all__ = [
    "GroundTruthEstimate",
    "KalmanFilterEstimate",
    "KfParams",
    "KfState",
    "mode_from_flags",
    "assemble_rbd",
]
