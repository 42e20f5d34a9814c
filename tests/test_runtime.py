import jax.numpy as jnp
import numpy as np

from qm_door_tpu.config import default_config
from qm_door_tpu.runtime.mrt import PolicyStore, evaluate_policy
from qm_door_tpu.runtime.safety import safety_check
from qm_door_tpu.runtime import targets as tg


def test_evaluate_policy_interpolation():
    times = jnp.array([0.0, 0.1, 0.2])
    X = jnp.stack([jnp.zeros(30), jnp.ones(30), 2 * jnp.ones(30)])
    U = jnp.stack([jnp.zeros(30), jnp.ones(30)])
    policy = PolicyStore(times=times, X=X, U=U)
    x, u = evaluate_policy(policy, 0.05)
    np.testing.assert_allclose(x, 0.5, atol=1e-12)
    x, u = evaluate_policy(policy, 0.15)
    np.testing.assert_allclose(x, 1.5, atol=1e-12)
    # clamped outside the horizon
    x, u = evaluate_policy(policy, 0.5)
    np.testing.assert_allclose(x, 2.0, atol=1e-12)
    x, u = evaluate_policy(policy, -1.0)
    np.testing.assert_allclose(x, 0.0, atol=1e-12)


def test_safety_check():
    x = jnp.zeros(30)
    assert bool(safety_check(x))
    assert not bool(safety_check(x.at[10].set(1.7)))   # pitch > pi/2
    assert not bool(safety_check(x.at[11].set(-1.7)))  # roll < -pi/2


def test_ee_goal_targets():
    cfg = default_config()
    obs = np.zeros(30)
    obs[6:12] = [0.0, 0.0, 0.4, 0.0, 0.0, 0.0]
    ee_state = np.array([0.6, 0.0, 0.8, 0.0, 0.0, 0.0, 1.0])
    goal_pos = np.array([1.0, 0.5, 0.8])
    goal_quat = np.array([0.0, 0.0, 0.0, 1.0])
    tt = tg.ee_goal_to_target_trajectories(goal_pos, goal_quat, obs, ee_state, 1.0, cfg)
    # 2 real knots; final state's EE block is the goal
    s1 = np.asarray(tt.states[1])
    np.testing.assert_allclose(s1[30:33], goal_pos, atol=1e-12)
    np.testing.assert_allclose(s1[33:37], goal_quat, atol=1e-12)
    # base target stands ARM_DIST behind the EE goal along yaw
    np.testing.assert_allclose(s1[6], goal_pos[0] - tg.ARM_DIST, atol=1e-12)
    np.testing.assert_allclose(s1[8], cfg.reference.com_height, atol=1e-12)
    # reaching time from displacement / velocity
    dist = np.linalg.norm(goal_pos - ee_state[:3])
    assert float(tt.times[1]) >= 1.0 + dist / cfg.reference.target_displacement_velocity - 1e-6
    # interpolation midway returns a mix
    mid = tt.desired_state(0.5 * (float(tt.times[0]) + float(tt.times[1])))
    assert 0.0 < float(mid[30]) - 0.6 < dist


def test_cmd_vel_targets():
    cfg = default_config()
    obs = np.zeros(30)
    obs[6:12] = [1.0, 2.0, 0.4, np.pi / 2, 0.0, 0.0]  # facing +y
    ee_state = np.array([1.0, 2.6, 0.8, 0.0, 0.0, 0.0, 1.0])
    last_ee = ee_state.copy()
    tt, last = tg.cmd_vel_to_target_trajectories(
        [0.3, 0.0, 0.0, 0.0], last_ee, obs, ee_state, 0.0, cfg
    )
    s1 = np.asarray(tt.states[1])
    # forward command in base frame moves the base target along +y (world)
    np.testing.assert_allclose(s1[6], 1.0, atol=1e-9)
    np.testing.assert_allclose(s1[7], 2.0 + 0.3 * cfg.mpc.time_horizon, atol=1e-9)
    # desired momentum head(3) = rotated velocity
    np.testing.assert_allclose(np.asarray(tt.states[0][:3]), [0.0, 0.3, 0.0], atol=1e-9)


def test_msgs_roundtrip():
    from qm_door_tpu.runtime import msgs

    ee = msgs.EeState(1.5, np.arange(7.0))
    assert msgs.EeState.from_array(ee.to_array()).time == 1.5
    obs = msgs.Observation(0.5, np.arange(30.0), np.arange(30.0) + 1, 9)
    o2 = msgs.Observation.from_array(obs.to_array())
    assert o2.mode == 9
    np.testing.assert_allclose(o2.input, obs.input)


def test_rollout_integrators(model):
    import jax.numpy as jnp
    from qm_door_tpu.config import default_config
    from qm_door_tpu.models import centroidal
    from qm_door_tpu.solver.rollout import rollout, rk45_step

    cfg = default_config()
    x0 = jnp.asarray(cfg.initial_state())
    u = centroidal.weight_compensating_input(model, jnp.ones(4))
    U = jnp.tile(u[None], (5, 1))
    X4 = rollout(model, x0, U, 0.015, substeps=1, method="rk4")
    X4b = rollout(model, x0, U, 0.015, substeps=4, method="rk4")
    assert X4.shape == (6, 30)
    # refinement changes little (smooth dynamics): integrator consistency
    np.testing.assert_allclose(X4[-1], X4b[-1], atol=1e-6)
    _, err = rk45_step(model, x0, u, 0.015)
    assert float(err) < 1e-6
