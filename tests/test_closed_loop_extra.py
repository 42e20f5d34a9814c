"""Additional closed-loop scenarios: disturbance rejection and the
separated-system (QMMpcController) control law."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qm_door_tpu.config import default_config
from qm_door_tpu.models import centroidal, kinematics
from qm_door_tpu.runtime.controller import QmController
from qm_door_tpu.runtime.mrt import PolicyStore
from qm_door_tpu.sim.sim import SimConfig, measured_rbd, sim_init, sim_step
from qm_door_tpu.wbc.wbc import WbcState


def test_separated_controller_tick(mpc_stack):
    """QMMpcController variant: 12-joint control law + HierarchicalMpcWbc."""
    model, cfg, ocp, solver, x0, targets = mpc_stack
    from qm_door_tpu.ocp.gait import GaitSchedule
    from qm_door_tpu.ocp.problem import build_stage_data

    cfg2 = default_config()
    cfg2.controller.leg_pd_start_time = -1.0
    stage = build_stage_data(model, cfg2, GaitSchedule(), targets, 0.0)
    sol = solver.solve(stage, x0)
    policy = PolicyStore(times=sol.times, X=sol.X, U=sol.U)

    ctrl = QmController(model, cfg2, separated=True)
    q0 = centroidal.pinocchio_q(x0)
    rbd = centroidal.rbd_from_generalized(model, q0, jnp.zeros(24))
    res = ctrl.tick(policy, jnp.ones(4), rbd, WbcState.init(), 0.0, 0.002)
    assert bool(res.safe)
    assert np.isfinite(np.asarray(res.wbc_cmd)).all()
    tau = np.asarray(res.command.tau_ff)
    assert (np.abs(tau) <= np.asarray(model.effort_limit) + 1e-6).all()


def test_push_disturbance_rejection(mpc_stack):
    """A lateral base push mid-stance: the WBC keeps the sim upright
    (the reference's disturbance-capable Gazebo worlds role)."""
    model, cfg0, ocp, solver, x0, targets = mpc_stack
    from qm_door_tpu.ocp.gait import GaitSchedule
    from qm_door_tpu.ocp.problem import build_stage_data

    cfg = default_config()
    cfg.controller.leg_pd_start_time = -1.0
    cfg.wbc.arm_init_time = -1.0
    stage = build_stage_data(model, cfg, GaitSchedule(), targets, 0.0)

    q0 = centroidal.pinocchio_q(x0)
    feet_z = float(jnp.mean(kinematics.contact_positions(model, q0)[:, 2]))
    q0 = q0.at[2].add(-feet_z)
    sim_cfg = SimConfig()
    sim = sim_init(model, q0, cfg=sim_cfg)

    rbd = measured_rbd(model, sim)
    x_obs = centroidal.centroidal_state_from_rbd(model, rbd)
    sol = solver.solve(stage, x_obs)
    sol = solver.solve(stage, x_obs, warm=(sol.times, sol.X, sol.U))
    policy = PolicyStore(times=sol.times, X=sol.X, U=sol.U)

    ctrl = QmController(model, cfg)
    wbc_state = WbcState.init()
    command = None
    push = jnp.asarray([0.0, 60.0, 0.0, 0.0, 0.0, 0.0])  # 60 N lateral, 0.1 s

    for step in range(400):  # 0.4 s at 1 kHz
        t = step * 0.001
        if step % 2 == 0:
            rbd = measured_rbd(model, sim)
            res = ctrl.tick(policy, jnp.ones(4), rbd, wbc_state, t, 0.002)
            wbc_state = res.wbc_state
            command = jnp.stack([
                res.command.pos_des, res.command.vel_des,
                res.command.kp, res.command.kd, res.command.tau_ff,
            ])
            assert bool(res.safe), f"went unsafe at t={t}"
        wrench = push if 100 <= step < 200 else jnp.zeros(6)
        sim = sim_step(model, sim_cfg, sim, command, external_wrench=wrench)

    q = np.asarray(sim.q)
    assert np.isfinite(q).all()
    assert abs(q[2] - 0.365) < 0.08      # height held
    assert abs(q[5]) < 0.25              # roll bounded under lateral push


def test_hot_reload_gains_no_recompile(mpc_stack):
    """dynamic_reconfigure parity: swapping WbcGains between ticks changes
    the command without recompiling the jitted tick."""
    model, cfg, ocp, solver, x0, targets = mpc_stack
    from qm_door_tpu.ocp.gait import GaitSchedule
    from qm_door_tpu.ocp.problem import build_stage_data

    cfg2 = default_config()
    cfg2.controller.leg_pd_start_time = -1.0
    cfg2.wbc.arm_init_time = -1.0
    stage = build_stage_data(model, cfg2, GaitSchedule(), targets, 0.0)
    sol = solver.solve(stage, x0)
    policy = PolicyStore(times=sol.times, X=sol.X, U=sol.U)

    ctrl = QmController(model, cfg2)
    q0 = centroidal.pinocchio_q(x0)
    # perturb the base so PD tasks produce nonzero feedback
    rbd = centroidal.rbd_from_generalized(
        model, q0.at[2].add(0.03), jnp.zeros(24)
    )
    res1 = ctrl.tick(policy, jnp.ones(4), rbd, WbcState.init(), 1.0, 0.002)
    n_compiles = ctrl._tick._cache_size()

    ctrl.gains = ctrl.gains.replace(
        base_height_kp=ctrl.gains.base_height_kp * 4.0,
        base_height_kd=ctrl.gains.base_height_kd * 2.0,
    )
    res2 = ctrl.tick(policy, jnp.ones(4), rbd, WbcState.init(), 1.0, 0.002)
    assert ctrl._tick._cache_size() == n_compiles  # no retrace
    # stiffer height gains -> different torque command
    d = np.abs(np.asarray(res1.command.tau_ff) - np.asarray(res2.command.tau_ff))
    assert d.max() > 1e-3, d.max()


@pytest.mark.slow
def test_separated_closed_loop_stance(mpc_stack):
    """ss-variant golden: the separated-system controller (HierarchicalMpcWbc)
    holds stance closed-loop (the reference's ss/ launch set; previously only
    covered by a single-tick test)."""
    import numpy as np

    from qm_door_tpu.ocp.gait import GaitSchedule
    from qm_door_tpu.sim.closed_loop import ClosedLoopRunner

    model, cfg0, ocp, solver, x0, targets = mpc_stack
    cfg = default_config()
    cfg.controller.leg_pd_start_time = -1.0
    cfg.wbc.arm_init_time = -1.0
    runner = ClosedLoopRunner(model, cfg, solver=solver, separated=True)
    log = runner.run(targets, duration=0.5)
    assert log.safe
    base = np.stack(log.base_pose)
    assert 0.33 < base[-1, 2] < 0.43
    assert np.abs(base[:, 4:6]).max() < 0.2
    assert log.mpc_viol[-1] < 1e-3
