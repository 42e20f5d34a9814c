import numpy as np

from qm_door_tpu.ocp.gait import GAIT_LIBRARY, GaitSchedule, STANCE
from qm_door_tpu.runtime.gait_command import GaitCommander
from qm_door_tpu.runtime.metrics import Metrics, TrajectoryRecorder
from qm_door_tpu.runtime.planner import CirclePlanner


def test_gait_commander_inserts_after_horizon():
    sched = GaitSchedule()
    cmd = GaitCommander(sched, time_horizon=1.0)
    cmd.command("trot", t_now=0.5)
    # still stance within the current horizon
    assert sched.mode_at(1.0) == STANCE
    # trotting after insertion point
    assert sched.mode_at(2.0) in (9, 6, STANCE)  # may hit transition stance
    assert sched.mode_at(2.3) in (9, 6)


def test_gait_commander_unknown_name():
    import pytest

    cmd = GaitCommander(GaitSchedule())
    with pytest.raises(KeyError):
        cmd.command("moonwalk", 0.0)


def test_metrics_timer_and_report():
    m = Metrics()
    t = m.timer("mpc")
    for _ in range(3):
        t.start()
        t.stop()
    m.count("solves", 3)
    m.gauge("violation", 1e-7)
    s = m.summary()
    assert s["timers"]["mpc"]["count"] == 3
    assert s["counters"]["solves"] == 3
    assert "mpc" in m.report()


def test_trajectory_recorder(tmp_path):
    r = TrajectoryRecorder()
    r.record(0.0, base=[1.0, 2.0, 3.0], cost=0.5)
    r.record(0.1, base=[1.0, 2.1, 3.0], cost=0.4)
    p = tmp_path / "traj.jsonl"
    r.dump(str(p))
    lines = p.read_text().strip().split("\n")
    assert len(lines) == 2


def test_circle_planner_progression():
    sched = GaitSchedule()
    planner = CirclePlanner(gait=GaitCommander(sched))
    # far away: target stays at circle center
    tgt = planner.update([0.0, 0.0, 0.0], 0.0)
    np.testing.assert_allclose(tgt[:3], [-1.4, 0.0, 1.0])
    # reach center: trot is commanded, planner waits out the transition
    tgt = planner.update([-1.4, 0.0, 1.0], 1.0)
    assert planner.initial_reached
    assert sched.mode_at(3.0) in (9, 6, STANCE)
    # after the wait, reaching the target advances along the circle
    tgt = planner.update([-1.4, 0.0, 1.0], 7.0)
    np.testing.assert_allclose(tgt[:3], [-1.4 + 1.2, 0.0, 1.0])
    tgt2 = planner.update(tgt[:3], 7.2)
    assert not np.allclose(tgt2[:3], tgt[:3])  # advanced to next waypoint
