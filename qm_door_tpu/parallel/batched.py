"""Batched scenario-parallel MPC: vmap over scenarios + mesh sharding.

This is the production serving shape: one jitted function advancing B
independent MPC problems one SQP iteration (the reference's 100 Hz advanceMpc,
batched). Shardings ride the scenario axis; per-scenario work is dense
small-matrix math that XLA maps onto the MXU via the batch dimension.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..ocp.problem import StageData
from ..solver.sqp import SqpSolver, sqp_iteration
from .mesh import SCENARIO_AXIS


class BatchedMpc:
    """B scenarios advanced in lock-step. Stage data may be shared
    (broadcast) or per-scenario (leading B axis)."""

    def __init__(self, solver: SqpSolver, mesh=None, shared_stage: bool = True):
        self.solver = solver
        self.mesh = mesh
        stage_axis = None if shared_stage else 0

        def step(stage: StageData, x_init, X, U):
            def one(x0, Xk, Uk):
                return sqp_iteration(
                    solver.model, solver.ocp, stage, solver.settings.dt,
                    solver.settings, x0, Xk, Uk,
                )

            return jax.vmap(one)(x_init, X, U)

        def step_stage_batched(stage, x_init, X, U):
            return jax.vmap(
                lambda s, x0, Xk, Uk: sqp_iteration(
                    solver.model, solver.ocp, s, solver.settings.dt,
                    solver.settings, x0, Xk, Uk,
                )
            )(stage, x_init, X, U)

        fn = step if shared_stage else step_stage_batched
        if mesh is not None:
            batch_sharding = NamedSharding(mesh, P(SCENARIO_AXIS))
            rep = NamedSharding(mesh, P())
            self._step = jax.jit(
                fn,
                in_shardings=(
                    rep if shared_stage else batch_sharding,
                    batch_sharding, batch_sharding, batch_sharding,
                ),
                out_shardings=(batch_sharding, batch_sharding, batch_sharding),
            )
        else:
            self._step = jax.jit(fn)

    def cold_start(self, stage: StageData, x_init_batch):
        N = self.solver.n_intervals
        B = x_init_batch.shape[0]
        X = jnp.tile(x_init_batch[:, None, :], (1, N + 1, 1))
        u_nom = stage.u_nom[:N] if stage.u_nom.ndim == 2 else stage.u_nom[:, :N]
        U = jnp.broadcast_to(u_nom, (B, N, 30)) if u_nom.ndim == 2 else u_nom
        return X, U

    def step(self, stage: StageData, x_init_batch, X, U):
        """One batched SQP/MPC iteration -> (X, U, stats)."""
        return self._step(stage, x_init_batch, X, U)
