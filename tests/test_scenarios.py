"""Scenario registry (qm_door_tpu/scenarios.py): the launch-file surface.
Construction-level checks here; the worlds' closed-loop behavior is covered
by the per-surface goldens (test_closed_loop*, test_terrain_locomotion,
test_world)."""
import jax.numpy as jnp
import numpy as np
import pytest

from qm_door_tpu.scenarios import (
    DOOR_SCENARIOS,
    SCENARIOS,
    make_scenario,
    walk_targets,
)


def test_registry_covers_reference_launch_worlds():
    # qm_gazebo/launch/{cs,ss}: empty, mobile, stairs, sar, pallets,
    # tunnel, vchimney, maze (+ the door worlds as dedicated runners)
    for name in ("empty", "mobile", "stairs", "sar", "pallets", "tunnel",
                 "vchimney", "maze"):
        assert name in SCENARIOS, name
    assert "push_door" in DOOR_SCENARIOS


@pytest.mark.parametrize("name", sorted(SCENARIOS))
def test_scenarios_construct(name, model):
    from qm_door_tpu.ocp.reference import TargetTrajectories
    from qm_door_tpu.sim.closed_loop import ClosedLoopRunner

    runner, targets = make_scenario(name, model=model)
    assert isinstance(runner, ClosedLoopRunner)
    assert isinstance(targets, TargetTrajectories)
    spec = SCENARIOS[name]
    assert runner.sim_cfg == spec.sim_cfg


def test_walk_targets_follow_terrain(model):
    from qm_door_tpu.config import default_config
    from qm_door_tpu.sim.sim import SimConfig

    cfg = default_config()
    sc = SimConfig(terrain="stairs", terrain_params=(0.4, 0.3, 0.06, 4.0))
    tt = walk_targets(model, cfg, v=0.3, duration=3.0, sim_cfg=sc)
    states = np.asarray(tt.states)
    # x advances at the commanded speed; z reference climbs with the stairs
    assert states[-1, 6] > states[0, 6]
    assert states[-1, 8] > states[0, 8] + 0.05
    # momentum reference carries the walk speed
    np.testing.assert_allclose(states[:, 0], 0.3, atol=1e-9)


def test_door_scenario_constructs(model):
    from qm_door_tpu.sim.door_loop import DoorOpeningRunner

    runner, targets = make_scenario("push_door", model=model)
    assert isinstance(runner, DoorOpeningRunner)
    assert targets is None
