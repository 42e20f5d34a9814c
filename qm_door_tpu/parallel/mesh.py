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


def multihost_mesh(coordinator_address=None, num_processes=None, process_id=None):
    """Multi-host scenario mesh over DCN (the >=2-host scaling axis of
    BASELINE.md). Call once per process before any other JAX use:

        mesh = multihost_mesh("host0:1234", num_processes=2, process_id=rank)

    On a single process this degrades to :func:`scenario_mesh` over the local
    devices. Scenario batches use jax.make_array_from_process_local_data so
    each host feeds its own shard; XLA keeps the per-scenario solves local
    (no cross-host traffic on the solve path — collectives appear only in
    user-level reductions such as fleet statistics).
    """
    if coordinator_address is not None:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return scenario_mesh()


def from_process_local(mesh: Mesh, local_batch):
    """Assemble a global scenario batch from per-host shards."""
    sharding = NamedSharding(mesh, P(SCENARIO_AXIS))
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sharding, x), local_batch
    )
