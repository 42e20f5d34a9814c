"""Door-opening closed-loop goldens (BASELINE config #4).

The full force-tracking stack — 36-input NMPC + force-aware WBC + the
articulated latched door with robot-body panel contact — executes the
reference's push-door demo: reach the handle, press the lever past the
latch, shove the panel open, coast, let go, and recover.

Round-5 state, pinned honestly by the long golden:
- the panel swings to its -2.0 rad stop (fully open) on release momentum;
- the robot stays SAFE for the whole 11 s window (8 s post-release) with
  attitude bounded well inside the +-pi/2 safety envelope, and is upright
  at the end;
- it does NOT hold station: the post-release recovery concedes position
  (measured-pose-following references, DoorScenario.follow_gain) and the
  robot wanders ~2 m while recovering — the walk-off that used to END in
  a fall inside 2 s now stays upright indefinitely.  Station-keeping
  after release remains future work (docs/ROADMAP.md round-5 notes).
"""
import numpy as np
import pytest

DURATION = 11.0  # press ~1 s + push ~2 s + release at ~3 s + 8 s recovery


@pytest.mark.slow
def test_door_opening_golden(model):
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
    mpc_t = np.asarray(log.mpc_t)
    phases = np.asarray(log.mpc_phase)

    # the lever was pressed past the latch threshold (the press phase
    # actually worked the handle, not just the panel)
    assert lever.min() < runner.door_cfg.latch_release
    # the panel swings to the fully-open stop and stays there
    assert panel.min() < -1.9, panel.min()
    assert panel[-1] < -1.9, panel[-1]
    # attitude bounded THROUGHOUT the 8 s post-release window (the old
    # failure mode was a fall 1.4-3 s after release), upright at the end
    assert np.abs(base[:, 4:6]).max() < 0.75, np.abs(base[:, 4:6]).max()
    assert np.abs(base[-1, 4:6]).max() < 0.45
    assert base[-1, 2] > 0.15
    # press/push executed feasibly; release transient recovered (median of
    # the done phase, which spans the whole 8 s recovery)
    for ph, tol in (("press", 1e-3), ("push", 1e-3), ("done", 1.0)):
        m = phases == ph
        assert m.any(), ph
        assert np.median(viol[m]) < tol, (ph, np.median(viol[m]))
    assert np.isfinite(base).all()
