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


def test_joy_gait_deadman_and_change_detection():
    """GaitJoyPublisher.cpp:35-60 semantics: deadman (button 4) + button
    0/1 selects trot/stance; repeats of the same command are ignored."""
    sched = GaitSchedule()
    cmd = GaitCommander(sched, time_horizon=1.0)
    # no deadman -> ignored
    assert cmd.joy_buttons([1, 0, 0, 0, 0], 0.0) is None
    # deadman + button 0 -> trot
    assert cmd.joy_buttons([1, 0, 0, 0, 1], 0.0) == "trot"
    assert sched.mode_at(1.3) in (9, 6)
    # repeat -> no-op (lastGaitCommand_ tracking)
    assert cmd.joy_buttons([1, 0, 0, 0, 1], 0.1) is None
    # both pressed -> stance wins
    assert cmd.joy_buttons([1, 1, 0, 0, 1], 0.2) == "stance"


def test_joy_teleop_axis_mapping():
    """joy.yaml: deadman-gated axis scales for cmd_vel / ee_cmd_vel."""
    from qm_door_tpu.runtime.gait_command import JoyTeleop

    joy = JoyTeleop()
    axes = [1.0, -0.5, 0.0, 0.4, -1.0]
    assert joy.cmd_vel(axes, [0, 0, 0, 0, 0, 0]) is None
    v = joy.cmd_vel(axes, [0, 0, 0, 0, 1, 0])
    np.testing.assert_allclose(v, [0.5 * -0.5, 0.3 * 1.0, 0.0, 1.57 * 0.4])
    assert joy.ee_cmd_vel(axes, [0, 0, 0, 0, 1, 0]) is None
    ve = joy.ee_cmd_vel(axes, [0, 0, 0, 0, 0, 1])
    np.testing.assert_allclose(ve, [0.5 * -0.5, 0.3 * 1.0, 0.1 * -1.0, 0.0])


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


def test_terrain_functions():
    import jax.numpy as jnp
    from qm_door_tpu.sim.terrain import terrain_height, default_params, TERRAINS

    x = jnp.asarray([0.0, 0.6, 1.2])
    y = jnp.zeros(3)
    for name in TERRAINS:
        z = terrain_height(name, x, y, default_params(name))
        assert z.shape == (3,)
    z = terrain_height("stairs", x, y, (0.5, 0.25, 0.08, 5.0))
    np.testing.assert_allclose(z, [0.0, 0.08, 0.24], atol=1e-9)
    z = terrain_height("step", x, y, (0.5, 0.1))
    np.testing.assert_allclose(z, [0.0, 0.1, 0.1], atol=1e-12)


def test_sim_step_on_step_terrain():
    import jax.numpy as jnp
    from qm_door_tpu.config import default_config
    from qm_door_tpu.models import aliengo_z1, centroidal
    from qm_door_tpu.sim.sim import SimConfig, sim_init, sim_step

    model = aliengo_z1()
    cfg = default_config()
    x0 = np.asarray(cfg.initial_state())
    q0 = jnp.asarray(x0[6:30])
    sc = SimConfig(terrain="step", terrain_params=(10.0, 0.1))  # step far away
    st = sim_init(model, q0, cfg=sc)
    cmd = jnp.stack([q0[6:24], jnp.zeros(18), jnp.full(18, 300.0),
                     jnp.full(18, 8.0), jnp.zeros(18)])
    for _ in range(50):
        st = sim_step(model, sc, st, cmd)
    assert bool(jnp.isfinite(st.q).all())


def test_viz_renders(tmp_path, model):
    import jax.numpy as jnp
    from qm_door_tpu.utils.viz import plot_solution, plot_support_and_footholds

    times = np.linspace(0, 1, 11)
    X = np.zeros((11, 30)); X[:, 8] = 0.4
    U = np.zeros((10, 30)); U[:, 2] = 68.0
    p1 = plot_solution(times, X, U, str(tmp_path / "sol.png"))
    assert (tmp_path / "sol.png").exists()

    from qm_door_tpu.config import default_config
    q = np.tile(np.asarray(default_config().initial_state())[6:30], (8, 1))
    q[:, 0] = np.linspace(0, 0.5, 8)
    flags = np.ones((8, 4)); flags[::2, 1] = 0
    p2 = plot_support_and_footholds(model, q, flags, str(tmp_path / "sup.png"))
    assert (tmp_path / "sup.png").exists()

    # force-arrow/CoP and TF-skeleton channels (QmVisualizer parity)
    from qm_door_tpu.utils.viz import contact_cop, plot_force_arrows, plot_skeleton

    u = np.zeros(36); u[2] = u[5] = u[8] = u[11] = 68.0; u[30] = 25.0
    plot_force_arrows(model, q[0], u, str(tmp_path / "forces.png"))
    assert (tmp_path / "forces.png").exists()
    plot_skeleton(model, q[0], str(tmp_path / "skel.png"))
    assert (tmp_path / "skel.png").exists()
    # CoP of equal vertical forces = foot centroid
    from qm_door_tpu.models import kinematics

    p_feet = np.asarray(kinematics.contact_positions(model, jnp.asarray(q[0])))
    cop = contact_cop(p_feet, u[:12].reshape(4, 3))
    np.testing.assert_allclose(cop[:2], p_feet[:, :2].mean(0), atol=1e-9)

    # flight-report dashboard (rqt_multiplot panel-set parity)
    from qm_door_tpu.utils.dashboard import flight_report

    class _Log:
        pass

    log = _Log()
    T = 20
    log.t = list(np.linspace(0, 1, T))
    log.x_obs = [np.zeros(30) for _ in range(T)]
    log.base_pose = [np.zeros(6) for _ in range(T)]
    log.ee_pos = [np.zeros(3) for _ in range(T)]
    log.tau = [np.zeros(18) for _ in range(T)]
    log.mpc_viol = [1e-6] * 5
    flight_report(log, str(tmp_path / "report.png"))
    assert (tmp_path / "report.png").exists()


def test_door_model():
    """Articulated door (door_push.urdf parity): latch blocks the panel until
    the lever is pulled; an opening push then swings the panel into [-2, 0]
    with hinge damping; limits clamp cleanly."""
    import jax.numpy as jnp
    import numpy as np
    from qm_door_tpu.sim.door import DoorConfig, DoorState, door_step, handle_position

    cfg = DoorConfig()
    st = DoorState.init(dtype=jnp.float64)
    dt = 0.001
    p_h = handle_position(cfg, st, jnp.float64)

    # push tangentially on the latched door (no lever pull): panel stays shut
    F_push = jnp.array([0.0, -30.0, 0.0])
    st1 = st
    for _ in range(200):
        st1 = door_step(cfg, st1, F_push, p_h, dt, latched=True)
    assert float(st1.angle) == 0.0

    # pull the lever down (-z force) AND push: door opens
    F = jnp.array([0.0, -30.0, -40.0])
    st2 = st
    for _ in range(1500):
        st2 = door_step(cfg, st2, F, handle_position(cfg, st2), dt, latched=True)
    assert float(st2.lever) < cfg.latch_release        # lever turned
    assert float(st2.angle) < -0.05, float(st2.angle)  # panel swung open
    assert float(st2.angle) >= cfg.panel_lower

    # handle position follows the panel
    p_h2 = np.asarray(handle_position(cfg, st2))
    assert not np.allclose(p_h2, np.asarray(p_h))

    # unlatched door with no force: damping decays the rate, angle clamps
    st3 = DoorState(angle=jnp.array(-1.9), rate=jnp.array(-3.0),
                    lever=jnp.array(0.0), lever_rate=jnp.array(0.0))
    for _ in range(3000):
        st3 = door_step(cfg, st3, jnp.zeros(3), p_h, dt, latched=False)
    assert float(st3.angle) >= cfg.panel_lower - 1e-9
    assert abs(float(st3.rate)) < 3.0


def test_door_grasp_coupled_step(model):
    """Robot + door coupled step: the grasp spring transmits force both ways
    (generalized torque on the robot, reaction torque on the door)."""
    import jax.numpy as jnp
    import numpy as np
    from qm_door_tpu.config import default_config
    from qm_door_tpu.models import centroidal, kinematics
    from qm_door_tpu.sim.door import DoorConfig, DoorState, coupled_step
    from qm_door_tpu.sim.sim import SimConfig, sim_init

    cfg = default_config()
    x0 = jnp.asarray(cfg.initial_state(), dtype=jnp.float64)
    q0 = centroidal.pinocchio_q(x0)
    # place the door handle exactly at the EE so the grasp starts relaxed
    _, p_ee = kinematics.ee_pose(model, q0)
    dcfg = DoorConfig(hinge_pos=(float(p_ee[0]) - 0.8, float(p_ee[1]) + 0.05),
                      handle_offset=(0.8, -0.05, float(p_ee[2])))
    sim = sim_init(model, q0, cfg=SimConfig())
    door = DoorState.init(dtype=jnp.float64)

    cmd = jnp.stack([q0[6:24], jnp.zeros(18, dtype=jnp.float64),
                     jnp.full(18, 150.0, dtype=jnp.float64),
                     jnp.full(18, 4.0, dtype=jnp.float64),
                     jnp.zeros(18, dtype=jnp.float64)])
    for _ in range(100):
        sim, door = coupled_step(model, SimConfig(), dcfg, sim, door, cmd)
    assert np.isfinite(np.asarray(sim.q)).all()
    assert np.isfinite(float(door.angle))


def test_stiction_anchor_stops_creep(model):
    """SimConfig.tangential_stiffness > 0: under a sustained sub-Coulomb
    lateral force the anchored feet hold station (displacement bounded),
    while the default velocity-damping model creeps continuously at
    v = F_t / c (the round-5 KF-vs-trot diagnosis, sim.py SimConfig note).
    Measured as late-window drift rate, not end pose (both models ratchet a
    similar one-off displacement during force application)."""
    import jax.numpy as jnp

    from qm_door_tpu.config import default_config
    from qm_door_tpu.models import kinematics
    from qm_door_tpu.sim.sim import SimConfig, sim_init, sim_step

    cfg = default_config()
    q0 = jnp.asarray(np.asarray(cfg.initial_state())[6:30])
    feet_z = float(jnp.mean(kinematics.contact_positions(model, q0)[:, 2]))
    q0 = q0.at[2].add(-feet_z)
    cmd = jnp.stack([q0[6:24], jnp.zeros(18), jnp.full(18, 300.0),
                     jnp.full(18, 8.0), jnp.zeros(18)])
    wrench = jnp.array([0.0, 25.0, 0.0, 0.0, 0.0, 0.0])  # sub-Coulomb

    rates = {}
    for kt in (0.0, 20000.0):
        sc = SimConfig(tangential_stiffness=kt)
        st = sim_init(model, q0, cfg=sc)
        y_1s = None
        for i in range(2000):
            st = sim_step(model, sc, st, cmd, external_wrench=wrench)
            if i == 999:
                y_1s = float(st.q[1])
        assert bool(jnp.isfinite(st.q).all())
        rates[kt] = float(st.q[1]) - y_1s  # drift over the second 1 s
    # creep model keeps sliding (~F/(4c) = 3 cm/s); anchors hold
    assert rates[0.0] > 0.01, rates
    assert abs(rates[20000.0]) < 0.004, rates
