import os, sys
sys.path.insert(0, "/root/repo")
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np
from qm_door_tpu.config import default_config
from qm_door_tpu.models import aliengo_z1, centroidal, kinematics, spatial
from qm_door_tpu.ocp.gait import GaitSchedule
from qm_door_tpu.ocp.problem import make_ocp_config
from qm_door_tpu.ocp.reference import TargetTrajectories
from qm_door_tpu.sim.batched_rollout import BatchedClosedLoop, stack_stages
from qm_door_tpu.sim.sim import SimConfig
from qm_door_tpu.solver.sqp import SqpSolver

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
    jnp.array([0.0, 1e5]), jnp.stack([tstate, tstate]), jnp.zeros((2, 30)))
sched = GaitSchedule()
sim_cfg = SimConfig()
stages = stack_stages(model, cfg, sched, targets, 0.0, 2, 10 * sim_cfg.dt, jnp.float64)
q0 = centroidal.pinocchio_q(x0)
feet_z = float(jnp.mean(kinematics.contact_positions(model, q0)[:, 2]))
q0 = q0.at[2].add(-feet_z)
rng = np.random.default_rng(3)
q0b = jnp.asarray(np.asarray(q0)[None] + rng.normal(size=(4, 24)) * 0.005)
outs = []
for chunk in (0, 2):
    loop = BatchedClosedLoop(model, cfg, solver, sim_cfg, 2, 10, cycle_chunk=chunk)
    stage0 = jax.tree.map(lambda x: x[0], stages)
    carry = loop.init_carry(stage0, q0b)
    carry, log = loop.run(stages, carry)
    outs.append((np.asarray(carry.sim.q), np.asarray(log.base_pose),
                 np.asarray(log.mpc_viol), np.asarray(carry.alive)))
for name, a, b in [("q", outs[0][0], outs[1][0]), ("base", outs[0][1], outs[1][1]),
                   ("viol", outs[0][2], outs[1][2])]:
    print(name, "max|d|:", np.abs(a - b).max())
print("alive:", outs[0][3], outs[1][3])
