"""Device-mesh helpers for scenario-parallel batched MPC.

The reference has no data parallelism (single robot, ROS topics — SURVEY.md
§2c); the TPU-native framework's scale-out axis is the *scenario batch*:
thousands of domain-randomized MPC problems solved lock-step, sharded over a
1-D (or 2-D scenario x host) ``jax.sharding.Mesh``. XLA inserts the ICI
collectives; nothing in the solver code changes.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

SCENARIO_AXIS = "scenario"


def scenario_mesh(n_devices=None, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (SCENARIO_AXIS,))


def shard_batch(tree, mesh: Mesh):
    """Place a pytree with leading scenario axis onto the mesh (sharded dim 0)."""
    sharding = NamedSharding(mesh, P(SCENARIO_AXIS))
    return jax.device_put(tree, sharding)


def replicate(tree, mesh: Mesh):
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)
