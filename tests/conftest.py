"""Test configuration: CPU backend with 8 virtual devices (for sharding tests)
and float64 enabled (model-core numerics are validated at f64; the TPU
production path runs f32/bf16)."""
import os

# Force CPU: the ambient environment points JAX_PLATFORMS at the tunneled TPU,
# which is reserved for bench runs; unit tests validate numerics on CPU at f64.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax

# The environment's sitecustomize imports jax and pins JAX_PLATFORMS=axon at
# interpreter start, so the env var alone is not enough — override the config.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# NOTE: do not enable the persistent compilation cache here — concurrent
# writers SIGABRT inside put_executable_and_time on this image (and the AOT
# entries fail machine-feature validation on reload anyway).

import numpy as np
import pytest


@pytest.fixture(scope="session")
def model():
    from qm_door_tpu.models import aliengo_z1

    return aliengo_z1()


@pytest.fixture()
def rng():
    return np.random.default_rng(0)


def random_q(rng, scale=0.5):
    q = rng.normal(size=24) * scale
    return q


def random_v(rng, scale=1.0):
    return rng.normal(size=24) * scale


@pytest.fixture(scope="session")
def mpc_stack(model):
    """Shared full-horizon MPC stack: building a SqpSolver per test module
    recompiles the whole solve graph; share one instance session-wide."""
    import jax.numpy as jnp
    from qm_door_tpu.config import default_config
    from qm_door_tpu.models import kinematics, spatial
    from qm_door_tpu.ocp.problem import make_ocp_config
    from qm_door_tpu.ocp.reference import TargetTrajectories
    from qm_door_tpu.solver.sqp import SqpSolver

    cfg = default_config()
    ocp = make_ocp_config(model, cfg)
    solver = SqpSolver(model, ocp, cfg)
    x0 = jnp.asarray(cfg.initial_state())
    R_ee, p_ee = kinematics.ee_pose(model, x0[6:30])
    quat = spatial.rot_to_quat(R_ee)
    tstate = jnp.concatenate([x0, p_ee, quat])
    targets = TargetTrajectories.create(
        jnp.array([0.0, 1e5]), jnp.stack([tstate, tstate]), jnp.zeros((2, 30))
    )
    return model, cfg, ocp, solver, x0, targets
