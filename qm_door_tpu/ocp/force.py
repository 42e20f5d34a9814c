"""Force-tracking OCP extension: EE wrench as a tracked input (config #4).

The reference keeps this on its ``force-tracking`` branch (README.md "three
branches" — not in the mounted snapshot), where the arm EE becomes an extra
contact and the input widens accordingly. Here the extension is data-driven:

- input u (36) = [foot forces (12); joint velocities (18); EE wrench (6)]
  (models/centroidal.ee_wrench; appended so 30-dim accessors stay valid),
- flow map adds the wrench's momentum-rate contribution
  (models/centroidal.flow_map_ft),
- the wrench is eliminated exactly like swing-foot forces when the per-node
  ``grasp_flags`` gate is 0 (solver/projection.project_node_chol_ft), and is
  a free input tracked toward u_nom[..., 30:36] when grasping,
- tracking weights live in the widened R (make_ocp_config_ft).

Everything downstream (transcription, Riccati, linesearch) is input-width
generic, so SqpSolver works unchanged on the widened problem.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..models import centroidal
from ..models.model import RobotModel
from .gait import GaitSchedule
from .problem import OcpConfig, StageData, build_stage_data, make_ocp_config
from .reference import TargetTrajectories

NU_FT = 36


def make_ocp_config_ft(model: RobotModel, cfg, dtype=jnp.float64) -> OcpConfig:
    """OcpConfig with R widened to (36, 36): base 30-dim R plus the EE-wrench
    tracking weights from cfg.force_tracking."""
    base = make_ocp_config(model, cfg, dtype=dtype)
    ft = cfg.force_tracking
    r_w = np.concatenate([np.full(3, ft.r_ee_force), np.full(3, ft.r_ee_torque)])
    R36 = np.zeros((NU_FT, NU_FT))
    R36[:30, :30] = np.asarray(base.R)
    R36[30:, 30:] = np.diag(r_w * cfg.cost.r_scaling)
    return base.replace(R=jnp.asarray(R36, dtype=dtype))


def widen_stage_data(
    stage: StageData,
    grasp_flags,
    wrench_ref,
    dtype=None,
) -> StageData:
    """Widen a 30-input StageData to the force-tracking problem.

    grasp_flags: (N+1,) in [0, 1] — gates the wrench input per node.
    wrench_ref: (N+1, 6) desired EE wrench while grasping (world frame,
    applied BY the robot on the environment... sign convention: the wrench in
    u is the external wrench ON the robot EE; a push on the door shows up as
    the reaction wrench here).
    """
    dtype = dtype or stage.u_nom.dtype
    grasp = jnp.asarray(grasp_flags, dtype=dtype)
    wref = jnp.asarray(wrench_ref, dtype=dtype) * grasp[:, None]

    # Make the nominal input wrench-consistent: the stance feet share the
    # reaction to the reference wrench force, so the tracking cost has its
    # unique minimum at (F = adjusted nominal, W = W_ref). Without this the
    # solver is indifferent between tracking the wrench and deviating the
    # feet (equal R weights on both blocks) and converges to an arbitrary
    # mix (observed: sign-flipped wrench at equal cost).
    flags = stage.contact_flags                      # (N+1, 4)
    n_stance = jnp.maximum(jnp.sum(flags, axis=-1, keepdims=True), 1.0)
    share = -wref[:, 0:3] / n_stance                 # (N+1, 3) per stance foot
    dF = flags[..., None] * share[:, None, :]        # (N+1, 4, 3)
    u_nom30 = stage.u_nom.at[:, 0:12].add(dF.reshape(flags.shape[0], 12))
    u_nom = jnp.concatenate([u_nom30, wref], axis=-1)
    return stage.replace(u_nom=u_nom, grasp_flags=grasp)


def build_stage_data_ft(
    model: RobotModel,
    cfg,
    schedule: GaitSchedule,
    targets: TargetTrajectories,
    t0: float,
    grasp_fn,
    wrench_fn,
    dtype=jnp.float64,
) -> StageData:
    """build_stage_data + wrench/grasp timeline.

    grasp_fn(times (N+1,)) -> (N+1,) grasp gate; wrench_fn(times) ->
    (N+1, 6) wrench reference. Both evaluated host-side per solve, mirroring
    how gait/swing references are compiled into per-node arrays.
    """
    stage = build_stage_data(model, cfg, schedule, targets, t0, dtype=dtype)
    times = stage.times
    return widen_stage_data(stage, grasp_fn(times), wrench_fn(times), dtype=dtype)


def weight_compensating_input_ft(model: RobotModel, contact_flags, dtype=None):
    """36-dim nominal input: weight-compensating foot forces, zero wrench."""
    u30 = centroidal.weight_compensating_input(model, contact_flags, dtype=dtype)
    return jnp.concatenate([u30, jnp.zeros(6, dtype=u30.dtype)])
