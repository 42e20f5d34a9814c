"""On-device batched closed-loop rollout (MPC-as-policy) — small smoke test.

Uses a short horizon and B=2 scenarios to keep CPU compile time in check;
the full-scale version runs on TPU via tools/rollout_bench.py.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qm_door_tpu.config import default_config
from qm_door_tpu.models import aliengo_z1, centroidal, kinematics, spatial
from qm_door_tpu.ocp.gait import GaitSchedule
from qm_door_tpu.ocp.problem import make_ocp_config
from qm_door_tpu.ocp.reference import TargetTrajectories
from qm_door_tpu.sim.batched_rollout import BatchedClosedLoop, stack_stages
from qm_door_tpu.sim.sim import SimConfig
from qm_door_tpu.solver.sqp import SqpSolver


@pytest.mark.slow
def test_batched_rollout_stance():
    model = aliengo_z1()
    cfg = default_config()
    cfg.mpc.time_horizon = 12 * cfg.sqp.dt  # short horizon for test speed
    ocp = make_ocp_config(model, cfg)
    solver = SqpSolver(model, ocp, cfg)

    x0 = jnp.asarray(cfg.initial_state())
    R_ee, p_ee = kinematics.ee_pose(model, x0[6:30])
    quat = spatial.rot_to_quat(R_ee)
    tstate = jnp.concatenate([x0, p_ee, quat])
    targets = TargetTrajectories.create(
        jnp.array([0.0, 1e5]), jnp.stack([tstate, tstate]), jnp.zeros((2, 30))
    )
    sched = GaitSchedule()  # stance

    mpc_decim, control_decim = 10, 2
    sim_cfg = SimConfig()
    loop = BatchedClosedLoop(model, cfg, solver, sim_cfg, control_decim, mpc_decim)

    n_cycles = 3
    stages = stack_stages(
        model, cfg, sched, targets, 0.0, n_cycles,
        mpc_decim * sim_cfg.dt, jnp.float64,
    )

    # two scenarios: nominal and slightly perturbed, feet grounded
    q0 = centroidal.pinocchio_q(x0)
    feet_z = float(jnp.mean(kinematics.contact_positions(model, q0)[:, 2]))
    q0 = q0.at[2].add(-feet_z)
    q0b = jnp.stack([q0, q0.at[0].add(0.01)])

    stage0 = jax.tree.map(lambda x: x[0], stages)
    carry = loop.init_carry(stage0, q0b)
    carry, log = loop.run(stages, carry)

    assert bool(carry.alive.all()), "both scenarios must survive stance"
    base = np.asarray(log.base_pose)  # (T, B, 6)
    assert np.isfinite(base).all()
    # stays upright near spawn height
    assert np.abs(base[-1, :, 2] - base[0, :, 2]).max() < 0.05
    assert np.abs(base[:, :, 4:6]).max() < 0.2
    assert np.isfinite(np.asarray(log.mpc_cost)).all()


@pytest.mark.slow
def test_cycle_chunk_matches_unchunked():
    """cycle_chunk=2 must reproduce the unchunked rollout: the chunked path
    only re-tiles the scenario axis through lax.map (the large-batch
    device-fault mitigation used by tools/rollout_bench.py). XLA fuses the
    two graphs differently, so f64 reassociation noise (~1e-15/step) is
    amplified by the stiff closed loop to ~1e-9 over two cycles — the
    tolerance bounds that, not exact equality."""
    model = aliengo_z1()
    cfg = default_config()
    cfg.mpc.time_horizon = 8 * cfg.sqp.dt
    ocp = make_ocp_config(model, cfg)
    solver = SqpSolver(model, ocp, cfg)

    x0 = jnp.asarray(cfg.initial_state())
    R_ee, p_ee = kinematics.ee_pose(model, x0[6:30])
    quat = spatial.rot_to_quat(R_ee)
    tstate = jnp.concatenate([x0, p_ee, quat])
    targets = TargetTrajectories.create(
        jnp.array([0.0, 1e5]), jnp.stack([tstate, tstate]), jnp.zeros((2, 30))
    )
    sched = GaitSchedule()
    sim_cfg = SimConfig()

    n_cycles = 2
    stages = stack_stages(
        model, cfg, sched, targets, 0.0, n_cycles,
        10 * sim_cfg.dt, jnp.float64,
    )
    q0 = centroidal.pinocchio_q(x0)
    feet_z = float(jnp.mean(kinematics.contact_positions(model, q0)[:, 2]))
    q0 = q0.at[2].add(-feet_z)
    rng = np.random.default_rng(3)
    q0b = jnp.asarray(np.asarray(q0)[None] + rng.normal(size=(4, 24)) * 0.005)

    outs = []
    for chunk in (0, 2):
        loop = BatchedClosedLoop(model, cfg, solver, sim_cfg, 2, 10,
                                 cycle_chunk=chunk)
        stage0 = jax.tree.map(lambda x: x[0], stages)
        carry = loop.init_carry(stage0, q0b)
        carry, log = loop.run(stages, carry)
        outs.append((np.asarray(carry.sim.q), np.asarray(log.base_pose),
                     np.asarray(log.mpc_viol), np.asarray(carry.alive)))

    q_a, base_a, viol_a, alive_a = outs[0]
    q_b, base_b, viol_b, alive_b = outs[1]
    assert (alive_a == alive_b).all()
    np.testing.assert_allclose(q_a, q_b, rtol=0, atol=1e-6)
    np.testing.assert_allclose(base_a, base_b, rtol=0, atol=1e-6)
    np.testing.assert_allclose(viol_a, viol_b, rtol=0, atol=1e-8)
