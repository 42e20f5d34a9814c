"""RobotModel: the fixed-size constants pytree every model function consumes.

The generalized-coordinate layout matches the reference's OCS2 centroidal
model (qm_controllers/config/task.info:151-190):

  q (24) = [ base position world (3);
             base ZYX euler (yaw, pitch, roll) (3);
             leg joints LF,LH,RF,RH x (HAA,HFE,KFE) (12);
             arm joints z1_joint_1..6 (6) ]
  v (24) = [ base linear velocity world (3);
             ZYX euler rates (3);
             joint velocities (18) ]

Contact (foot) ordering is LF, RF, LH, RH — the OCS2 ``contactNames3DoF``
order used for contact forces and gait flags
(qm_interface/include/qm_interface/common/ModelSettings.h:38).
"""
from __future__ import annotations

import json
import os
from typing import Tuple

import jax.numpy as jnp
from flax import struct

# Canonical actuated-joint order (pinocchio tree order of the reference model;
# see task.info initialState comments: legs LF,LH,RF,RH then arm).
JOINT_NAMES = (
    "LF_HAA", "LF_HFE", "LF_KFE",
    "LH_HAA", "LH_HFE", "LH_KFE",
    "RF_HAA", "RF_HFE", "RF_KFE",
    "RH_HAA", "RH_HFE", "RH_KFE",
    "z1_joint_1", "z1_joint_2", "z1_joint_3",
    "z1_joint_4", "z1_joint_5", "z1_joint_6",
)

# Contact-force / gait-flag order (ModelSettings.h:38).
CONTACT_FRAMES = ("LF_FOOT", "RF_FOOT", "LH_FOOT", "RH_FOOT")
EE_FRAME = "z1_end_effector"
BASE_FRAME = "base"

NUM_JOINTS = 18
NQ = 24  # 6 base + 18 joints
NV = 24
NUM_CONTACTS = 4
STATE_DIM = 30  # [h_com/m (6); base pose (6); joints (18)]
INPUT_DIM = 30  # [contact forces (12); joint velocities (18)]
GRAVITY = 9.81


@struct.dataclass
class RobotModel:
    # --- static metadata (not traced) ---
    name: str = struct.field(pytree_node=False)
    joint_names: Tuple[str, ...] = struct.field(pytree_node=False)
    joint_parent: Tuple[int, ...] = struct.field(pytree_node=False)  # body idx, 0 = base
    frame_names: Tuple[str, ...] = struct.field(pytree_node=False)
    frame_parent: Tuple[int, ...] = struct.field(pytree_node=False)
    contact_frame_ids: Tuple[int, ...] = struct.field(pytree_node=False)
    ee_frame_id: int = struct.field(pytree_node=False)
    base_frame_id: int = struct.field(pytree_node=False)

    # --- arrays (traced leaves) ---
    joint_rot: jnp.ndarray      # (18,3,3) joint frame rotation in parent body frame
    joint_trans: jnp.ndarray    # (18,3)
    joint_axis: jnp.ndarray     # (18,3) unit axis in joint frame
    body_mass: jnp.ndarray      # (19,)  0 = base
    body_com: jnp.ndarray       # (19,3) in body frame
    body_inertia: jnp.ndarray   # (19,3,3) about body com, body frame
    frame_rot: jnp.ndarray      # (F,3,3) in parent body frame
    frame_trans: jnp.ndarray    # (F,3)
    effort_limit: jnp.ndarray   # (18,)
    velocity_limit: jnp.ndarray
    pos_lower: jnp.ndarray
    pos_upper: jnp.ndarray

    @property
    def nj(self) -> int:
        return len(self.joint_names)

    @property
    def total_mass(self):
        return jnp.sum(self.body_mass)


def from_dict(d, dtype=jnp.float64) -> RobotModel:
    arr = lambda x: jnp.asarray(x, dtype=dtype)
    frame_names = tuple(d["frame_names"])
    return RobotModel(
        name=d["name"],
        joint_names=tuple(d["joint_names"]),
        joint_parent=tuple(d["joint_parent"]),
        frame_names=frame_names,
        frame_parent=tuple(d["frame_parent"]),
        contact_frame_ids=tuple(frame_names.index(f) for f in CONTACT_FRAMES),
        ee_frame_id=frame_names.index(EE_FRAME) if EE_FRAME in frame_names else -1,
        base_frame_id=frame_names.index(BASE_FRAME) if BASE_FRAME in frame_names else -1,
        joint_rot=arr(d["joint_rot"]),
        joint_trans=arr(d["joint_trans"]),
        joint_axis=arr(d["joint_axis"]),
        body_mass=arr(d["body_mass"]),
        body_com=arr(d["body_com"]),
        body_inertia=arr(d["body_inertia"]),
        frame_rot=arr(d["frame_rot"]),
        frame_trans=arr(d["frame_trans"]),
        effort_limit=arr(d["effort_limit"]),
        velocity_limit=arr(d["velocity_limit"]),
        pos_lower=arr(d["pos_lower"]),
        pos_upper=arr(d["pos_upper"]),
    )


def load_model(path, dtype=None) -> RobotModel:
    if dtype is None:
        import jax

        dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    with open(path) as f:
        return from_dict(json.load(f), dtype=dtype)


_ASSET = os.path.join(os.path.dirname(__file__), "..", "assets", "aliengo_z1.json")


def aliengo_z1(dtype=None) -> RobotModel:
    """The flagship AlienGo + Z1 quadruped-manipulator model."""
    return load_model(_ASSET, dtype=dtype)
