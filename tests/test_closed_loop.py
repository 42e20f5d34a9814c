"""Golden closed-loop tests: the full stack (sim + estimator + MPC + WBC +
control law) holding stance and trotting on flat ground — the role Gazebo
integration plays for the reference (SURVEY.md §4)."""
import jax.numpy as jnp
import numpy as np
import pytest

from qm_door_tpu.config import default_config
from qm_door_tpu.models import aliengo_z1, centroidal, kinematics, spatial
from qm_door_tpu.ocp.gait import GAIT_LIBRARY, GaitSchedule
from qm_door_tpu.ocp.reference import TargetTrajectories
from qm_door_tpu.sim.closed_loop import ClosedLoopRunner


def _hold_targets(model, cfg):
    x0 = jnp.asarray(cfg.initial_state())
    R_ee, p_ee = kinematics.ee_pose(model, x0[6:30])
    quat = spatial.rot_to_quat(R_ee)
    state = jnp.concatenate([x0, p_ee, quat])
    return TargetTrajectories.create(
        jnp.array([0.0, 1e5]), jnp.stack([state, state]), jnp.zeros((2, 30))
    )


@pytest.fixture()
def setup(mpc_stack):
    model, cfg0, ocp, solver, x0, targets = mpc_stack
    cfg = default_config()
    # command legs from t = 0 in simulation (the reference's 10 s gate is a
    # Gazebo bring-up artifact)
    cfg.controller.leg_pd_start_time = -1.0
    cfg.wbc.arm_init_time = -1.0
    return model, cfg, solver


@pytest.mark.slow
def test_stance_hold_half_second(setup):
    model, cfg, solver = setup
    runner = ClosedLoopRunner(model, cfg, solver=solver)
    log = runner.run(_hold_targets(model, cfg), duration=0.5)
    assert log.safe
    base = np.stack(log.base_pose)
    # stays upright, climbing from the grounded spawn height (~0.365) toward
    # the 0.4 target
    assert 0.35 < base[-1, 2] < 0.42
    assert base[-1, 2] > base[0, 2] - 0.01
    assert np.abs(base[:, 4:6]).max() < 0.2  # pitch/roll bounded
    # MPC converges to near-exact feasibility
    assert log.mpc_viol[-1] < 1e-4


@pytest.mark.slow
def test_trot_one_second(setup):
    model, cfg, solver = setup
    sched = GaitSchedule()
    sched.insert_template(GAIT_LIBRARY["trot"], 0.0, 5.0)
    runner = ClosedLoopRunner(model, cfg, schedule=sched, solver=solver)
    log = runner.run(_hold_targets(model, cfg), duration=1.0)
    assert log.safe
    base = np.stack(log.base_pose)
    assert abs(base[-1, 2] - 0.4) < 0.1
    assert np.abs(base[:, 4:6]).max() < 0.35
    # base does not drift away laterally
    assert np.abs(base[-1, :2]).max() < 0.25
