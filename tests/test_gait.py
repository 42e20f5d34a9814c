import numpy as np

from qm_door_tpu.ocp.gait import (
    GAIT_LIBRARY,
    GaitSchedule,
    ModeSequenceTemplate,
    STANCE,
    flags_to_mode,
    mode_to_flags,
)
from qm_door_tpu.ocp.swing import SwingConfig, compile_swing_references


def test_mode_flag_roundtrip():
    for mode in range(16):
        assert flags_to_mode(mode_to_flags(mode)) == mode
    np.testing.assert_allclose(mode_to_flags(STANCE), [1, 1, 1, 1])
    np.testing.assert_allclose(mode_to_flags(9), [1, 0, 0, 1])  # LF_RH


def test_gait_library_complete():
    assert set(GAIT_LIBRARY) == {
        "stance", "trot", "standing_trot", "flying_trot", "pace", "standing_pace",
        "dynamic_walk", "static_walk", "amble", "lindyhop", "skipping", "pawup",
    }
    trot = GAIT_LIBRARY["trot"]
    assert trot.duration == 0.70
    assert mode_to_flags(trot.modes[0]).tolist() == [1, 0, 0, 1]
    assert mode_to_flags(trot.modes[1]).tolist() == [0, 1, 1, 0]


def test_initial_schedule_stance():
    sched = GaitSchedule()
    assert sched.mode_at(0.1) == STANCE
    assert sched.mode_at(5.0) == STANCE
    tl = sched.compile_timeline(0.0, 1.0, 0.015)
    assert tl.modes.shape == (67 + 1 - 1,) or tl.modes.shape[0] == int(round(1.0 / 0.015)) + 1
    assert (tl.contact_flags == 1).all()


def test_trot_insertion_and_periodicity():
    sched = GaitSchedule()
    sched.insert_template(GAIT_LIBRARY["trot"], 1.0, 5.0)
    # Before insertion: stance
    assert sched.mode_at(0.5) == STANCE
    # After: alternating LF_RH / RF_LH with period 0.7
    m1 = sched.mode_at(1.1)
    m2 = sched.mode_at(1.45)
    assert {m1, m2} == {9, 6}
    assert sched.mode_at(1.1 + 0.7) == m1
    assert sched.mode_at(1.45 + 0.7) == m2


def test_phase_transition_stance_inserted():
    sched = GaitSchedule(phase_transition_stance_time=0.1)
    sched.insert_template(GAIT_LIBRARY["trot"], 1.0, 3.0)
    # switching trot -> pace must insert a 0.1 s STANCE at the transition
    sched.insert_template(GAIT_LIBRARY["pace"], 2.0, 5.0)
    mode_at_transition = sched.mode_at(2.05)
    assert mode_at_transition == STANCE


def test_timeline_against_mode_at():
    sched = GaitSchedule()
    sched.insert_template(GAIT_LIBRARY["trot"], 0.4, 3.0)
    tl = sched.compile_timeline(0.2, 1.0, 0.015)
    for t, m in zip(tl.times, tl.modes):
        assert sched.mode_at(float(t)) == m


def test_swing_reference_profile():
    cfg = SwingConfig()
    sched = GaitSchedule()
    sched.insert_template(GAIT_LIBRARY["trot"], 0.0, 3.0)
    times = np.arange(0.0, 1.0, 0.015)
    z_pos, z_vel = compile_swing_references(sched, times, cfg)
    assert z_pos.shape == (len(times), 4)
    # during stance phases reference velocity is 0 at terrain height
    tl = sched.compile_timeline(0.0, 1.0 - 0.015, 0.015)
    stance_mask = tl.contact_flags.astype(bool)
    np.testing.assert_allclose(z_vel[stance_mask], 0.0, atol=1e-12)
    np.testing.assert_allclose(z_pos[stance_mask], cfg.terrain_height, atol=1e-12)
    # swing phases reach a positive apex <= swing height and start upward
    swing_mask = ~stance_mask
    assert z_pos[swing_mask].max() > 0.05
    assert z_pos[swing_mask].max() <= cfg.swing_height + 1e-9
    # velocity must integrate position approximately (consistency)
    foot = 0
    zp = z_pos[:, foot]
    zv = z_vel[:, foot]
    dz_fd = np.gradient(zp, 0.015)
    # compare away from phase boundaries
    interior = np.ones_like(zp, dtype=bool)
    interior[:2] = interior[-2:] = False
    err = np.abs(dz_fd - zv)[interior]
    assert np.median(err) < 0.25
