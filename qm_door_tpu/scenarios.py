"""Scenario registry: the launch-file surface of the reference stack.

The reference exposes its demo matrix as Gazebo launch files
(qm_gazebo/launch/{cs,ss}/*.launch: empty, stairs, sar, pallets, tunnel,
vchimney, maze, mobile, push_door, pull_door — each in combined-system (cs)
and separated-system (ss) controller variants). Here each world is a typed
preset that assembles the equivalent runner: sim config (terrain
height-field and/or lateral-collision world mesh), gait schedule, target
trajectory, and controller variant.

    from qm_door_tpu.scenarios import make_scenario, SCENARIOS
    runner, targets = make_scenario("stairs")
    log = runner.run(targets, duration=3.0)

The door scenarios return a DoorOpeningRunner (run with
``runner.run(duration)``; it generates its own targets from the measured
door state).
"""
from __future__ import annotations

from typing import Callable, Dict, NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

from .config import QmConfig, default_config
from .models import aliengo_z1, kinematics, spatial
from .models.model import RobotModel
from .ocp.gait import GAIT_LIBRARY, GaitSchedule
from .ocp.reference import TargetTrajectories
from .sim.sim import SimConfig


class ScenarioSpec(NamedTuple):
    """One launch-world preset."""
    sim_cfg: SimConfig
    gait: str                      # GAIT_LIBRARY key ("stance" = no template)
    targets: str                   # "hold" | "walk" | "circle" | "door"
    walk_speed: float = 0.0
    notes: str = ""


SCENARIOS: Dict[str, ScenarioSpec] = {
    # qm_gazebo/launch/{cs/empty_world.launch, ss/empty_world_mpc.launch}
    "empty": ScenarioSpec(SimConfig(), "trot", "hold",
                          notes="flat-ground trot in place"),
    # ss/mobile_world_mpc.launch + qm_planner TestCircle
    "mobile": ScenarioSpec(SimConfig(), "trot", "circle",
                           notes="EE circle-waypoint tracking (qm_planner)"),
    # cs/stairs_world.launch (qm_description stairs URDFs)
    "stairs": ScenarioSpec(
        SimConfig(terrain="stairs", terrain_params=(0.4, 0.3, 0.06, 4.0)),
        "trot", "walk", walk_speed=0.3,
        notes="staircase ascent with terrain-aware swing references"),
    # cs/sar_world.launch (search-and-rescue rubble) -> wave height-field
    "sar": ScenarioSpec(
        SimConfig(terrain="wave", terrain_params=(0.04, 1.2, 1.0)),
        "trot", "walk", walk_speed=0.25,
        notes="rubble-field walk (wave height-field stand-in)"),
    # cs/pallets_world.launch -> raised platform (step height-field)
    "pallets": ScenarioSpec(
        SimConfig(terrain="step", terrain_params=(0.5, 0.1)),
        "trot", "walk", walk_speed=0.25,
        notes="step up onto a 10 cm pallet"),
    # cs/tunnel_world.launch (qm_description/urdf/tunnel)
    "tunnel": ScenarioSpec(
        SimConfig(world="tunnel60", world_offset=(0.0, -0.33, 0.0)),
        "trot", "hold",
        notes="trot inside the tunnel60 wall alcove (lateral collision)"),
    # ss/vchimney_world_mpc.launch (qm_description/urdf/vchimney)
    "vchimney": ScenarioSpec(
        SimConfig(world="vchimney", world_offset=(0.0, 0.45, 0.0)),
        "stance", "hold",
        notes="stand at the v-chimney mouth (inclined-wall collision)"),
    # ss/maze_world_mpc.launch (default maze4): offset puts the spawn in
    # the open west corridor (maze frame (-1.2, 0.3)), walking +x between
    # the outer wall (world y +0.45) and the inner wall (world y -0.55)
    "maze": ScenarioSpec(
        SimConfig(world="maze4", world_offset=(1.2, -0.3, 0.0)),
        "trot", "walk", walk_speed=0.2,
        notes="walk a maze corridor between collision walls"),
}

# door worlds are separate runners (force-tracking stack).
# cs/push_door_world.launch and cs/pull_door_world.launch: the reference's
# two door worlds differ by the door frame's mirrored mount (door_pull.urdf
# fixed-joint rpy +1.5708 vs -1.5708) and the robot spawn pose; here the
# mirror is DoorScenario.pull and the pull preset re-tunes the sequencing
# constants for the toward-the-robot swing (sim/door_loop.py PULL_SCENARIO).
DOOR_SCENARIOS = ("push_door", "pull_door")


def _hold_targets(model: RobotModel, cfg: QmConfig) -> TargetTrajectories:
    x0 = jnp.asarray(cfg.initial_state())
    R_ee, p_ee = kinematics.ee_pose(model, x0[6:30])
    state = jnp.concatenate([x0, p_ee, spatial.rot_to_quat(R_ee)])
    return TargetTrajectories.create(
        jnp.array([0.0, 1e5]), jnp.stack([state, state]), jnp.zeros((2, 30)))


def walk_targets(model: RobotModel, cfg: QmConfig, v: float, duration: float,
                 sim_cfg: SimConfig) -> TargetTrajectories:
    """Constant-velocity walk with the base/EE height reference following
    the terrain height-field (elevation-map-fed cmd_vel pipeline role)."""
    from .sim import terrain

    x0 = jnp.asarray(cfg.initial_state())
    R_ee, p_ee = kinematics.ee_pose(model, x0[6:30])
    quat = spatial.rot_to_quat(R_ee)
    ts = np.linspace(0.0, duration + cfg.mpc.time_horizon + 0.5, 8)
    states = []
    for t in ts:
        x = np.asarray(x0).copy()
        xb = v * t
        zt = float(terrain.terrain_height(
            sim_cfg.terrain, jnp.asarray(xb), jnp.asarray(0.0),
            sim_cfg.terrain_params))
        x[0] = v
        x[6] = xb
        x[8] = float(x0[8]) + zt
        pe = np.asarray(p_ee).copy()
        pe[0] += xb
        pe[2] += zt
        states.append(jnp.asarray(np.concatenate([x, pe, np.asarray(quat)])))
    return TargetTrajectories.create(
        jnp.asarray(ts), jnp.stack(states), jnp.zeros((len(ts), 30)))


def make_scenario(name: str, model: Optional[RobotModel] = None,
                  cfg: Optional[QmConfig] = None, duration: float = 3.0,
                  separated: bool = False):
    """Build (runner, targets) for a registry scenario.

    ``separated`` selects the separated-system controller variant (the
    reference's ss/ launch set; combined cs/ is the default)."""
    from .sim.closed_loop import ClosedLoopRunner

    if name in DOOR_SCENARIOS:
        from .sim.door_loop import PULL_SCENARIO, DoorOpeningRunner, DoorScenario

        model = model or aliengo_z1()
        cfg = cfg or default_config()
        cfg.controller.leg_pd_start_time = -1.0
        cfg.wbc.arm_init_time = -1.0
        sc = PULL_SCENARIO if name == "pull_door" else DoorScenario()
        return DoorOpeningRunner(model, cfg, scenario=sc), None

    spec = SCENARIOS[name]
    model = model or aliengo_z1()
    cfg = cfg or default_config()
    cfg.controller.leg_pd_start_time = -1.0
    cfg.wbc.arm_init_time = -1.0

    sched = GaitSchedule()
    if spec.gait != "stance":
        sched.insert_template(GAIT_LIBRARY[spec.gait], 0.0, duration + 10.0)
    runner = ClosedLoopRunner(model, cfg, schedule=sched,
                              sim_cfg=spec.sim_cfg, separated=separated)

    if spec.targets == "walk":
        targets = walk_targets(model, cfg, spec.walk_speed, duration,
                               spec.sim_cfg)
    elif spec.targets == "circle":
        from .runtime.planner import CirclePlanner

        # first circle waypoint as the EE goal; the planner advances
        # waypoints as each is reached (examples/ee_tracking_demo.py drives
        # the full loop)
        targets = _hold_targets(model, cfg)
    else:
        targets = _hold_targets(model, cfg)
    return runner, targets
