"""Batched scenario-parallel MPC: natively-batched SQP + mesh sharding.

This is the production serving shape: one jitted function advancing B
independent MPC problems one SQP iteration (the reference's 100 Hz advanceMpc,
batched). The per-scenario math is dispatched through
solver/batched_sqp.batched_sqp_iteration, which routes the projected-LQ solve
to the lanes-last Pallas kernels on TPU (ops/pallas_lq.py) and runs the
early-exit filter linesearch across the whole batch. Shardings ride the
scenario axis.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..ocp.problem import StageData
from ..solver.batched_sqp import batched_sqp_iteration
from ..solver.sqp import SqpSolver
from .mesh import SCENARIO_AXIS


class BatchedMpc:
    """B scenarios advanced in lock-step. Stage data may be shared
    (broadcast) or per-scenario (leading B axis).

    backend: "auto" (batch-major + Pallas Cholesky on TPU, batch-major XLA
    elsewhere), or explicitly "bm_pallas" / "bm_xla" / "xla" / "pallas"
    (see solver/batched_sqp.py). With a mesh, pallas-backed steps run under
    shard_map over the scenario axis so the kernels see only the local shard.
    """

    def __init__(self, solver: SqpSolver, mesh=None, shared_stage: bool = True,
                 backend: str = "auto"):
        self.solver = solver
        self.mesh = mesh
        if backend == "auto":
            # Batch-major sweep; lanes-last Pallas Cholesky gain solve on TPU
            # (tools/microbench_ops.py: XLA's batched cho_solve is the hot
            # spot there), batch-major XLA elsewhere.
            backend = ("bm_pallas" if jax.default_backend() == "tpu"
                       else "bm_xla")
        self.backend = backend

        def fn(stage: StageData, x_init, X, U):
            return batched_sqp_iteration(
                solver.model, solver.ocp, stage, solver.settings.dt,
                solver.settings, x_init, X, U,
                stage_batched=not shared_stage, backend=backend,
            )

        if mesh is not None and "pallas" in backend:
            # GSPMD cannot partition an opaque pallas_call: run the whole
            # step under shard_map so each device executes the kernels on
            # its local scenario shard (no collectives on the solve path).
            bspec = P(SCENARIO_AXIS)
            sspec = P() if shared_stage else bspec
            self._step = jax.jit(jax.shard_map(
                fn, mesh=mesh,
                in_specs=(sspec, bspec, bspec, bspec),
                out_specs=(bspec, bspec, (bspec,) * 3),
                check_vma=False,
            ))
        elif mesh is not None:
            batch_sharding = NamedSharding(mesh, P(SCENARIO_AXIS))
            rep = NamedSharding(mesh, P())
            self._step = jax.jit(
                fn,
                in_shardings=(
                    rep if shared_stage else batch_sharding,
                    batch_sharding, batch_sharding, batch_sharding,
                ),
                out_shardings=(batch_sharding, batch_sharding,
                               (batch_sharding,) * 3),
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
