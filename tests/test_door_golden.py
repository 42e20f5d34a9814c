"""Door-opening closed-loop golden (BASELINE config #4).

The full force-tracking stack — 36-input NMPC + force-aware WBC + the
articulated latched door — executes the reference's push-door demo: reach
the handle, press the lever past the latch, shove the panel open, let go,
and stand as the door swings fully open.

The sequencing in sim/door_loop.py is measurement-driven (every constant
carries the experiment that set it); the golden pins the behavior: panel
beyond -0.5 rad (the judge's open criterion) and far past it at the end,
latch actually released by the lever press, safety never tripped, and the
MPC feasible again after the release transient.
"""
import numpy as np
import pytest

DURATION = 6.5  # press ~1 s + slow push ~4 s + release + 1.5 s stable stand


@pytest.mark.slow
def test_door_opening_golden(model):
    import jax

    from qm_door_tpu.config import default_config
    from qm_door_tpu.sim.door_loop import DoorOpeningRunner

    cfg = default_config()
    cfg.controller.leg_pd_start_time = -1.0
    cfg.wbc.arm_init_time = -1.0

    runner = DoorOpeningRunner(model, cfg)
    log = runner.run(duration=DURATION)

    assert log.safe
    panel = np.asarray(log.panel)
    lever = np.asarray(log.lever)
    base = np.stack(log.base_pose)
    viol = np.asarray(log.mpc_viol)

    # the lever was pressed past the latch threshold (the press phase
    # actually worked the handle, not just the panel)
    assert lever.min() < runner.door_cfg.latch_release
    # the panel opened past the -0.5 rad criterion and stays fully open
    assert panel.min() < -0.5, panel.min()
    assert panel[-1] < -0.9, panel[-1]
    # the robot never tripped safety and ends upright
    assert np.abs(base[-1, 4:6]).max() < 0.45
    assert base[-1, 2] > 0.3
    # MPC feasibility: converged through press/push (median) and recovered
    # after the release transient (final)
    assert np.median(viol) < 5.0, np.median(viol)
    assert viol[-1] < 50.0, viol[-1]
