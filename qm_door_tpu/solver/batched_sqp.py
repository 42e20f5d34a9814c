"""Natively-batched SQP iteration: the production serving path.

``sqp_iteration`` (solver/sqp.py) is a per-scenario function; vmapping it over
scenarios leaves every small-matrix op with the batch on a major axis, which
XLA pads to (8, 128) tiles (docs/PERF.md finding #1). This module is the
batch-aware formulation of the same math:

- linearization stays a vmap (fused elementwise pipelines — XLA handles it),
- the projected LQ solve defaults to the batch-major formulation
  (transcription.project_ocp_batched + riccati.lqr_solve_batched): ONE
  (B*N)-batched SPD solve for the projection and an unrolled batch-major
  Riccati scan, with the lanes-last Pallas Cholesky kernel
  (ops/pallas_chol.spd_solve) as the gain/projection solver on TPU where
  XLA's batched cho_solve is the measured hot spot (~840 us marginal at
  (256,30,31) vs ~0 for the kernel, tools/microbench_ops.py). Backends:
  "bm_pallas" (TPU default), "bm_xla" (CPU default), "xla" (per-scenario
  vmap reference), "pallas" (whole-LQ lanes-last kernels, ops/pallas_lq.py
  — measured 28x slower, kept as a reference),
- the filter linesearch becomes an early-exit ``lax.while_loop`` over the
  alpha grid: per iteration one batched trajectory evaluation; the loop stops
  as soon as every scenario has accepted a step. The accepted alpha per
  scenario is identical to the full sweep (both take the largest accepted
  candidate) — warm-started MPC ticks accept the first candidate, turning 4
  evaluations into 1 (OCS2's sequential linesearch has the same behavior,
  ocs2_sqp FilterLinesearch).

Matches vmap(sqp_iteration) bit-for-bit up to f32 reassociation;
tests/test_batched_sqp.py asserts equivalence.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..models.model import RobotModel
from ..ocp import constraints as cons
from ..ocp.problem import OcpConfig, StageData
from .riccati import lqr_solve, lqr_solve_batched
from .sqp import evaluate_trajectory
from .transcription import linearize_ocp, project_ocp, project_ocp_batched


def _accept(cost0, viol0, costs, viols, alpha, settings):
    """OCS2 FilterLinesearch acceptance rule (same as sqp._linesearch)."""
    decrease_viol = viols < (1.0 - 1e-3) * viol0
    decrease_cost = costs < cost0 - settings.armijo_factor * alpha * jnp.abs(cost0)
    ok_infeasible = decrease_viol
    ok_feasible = jnp.logical_and(
        decrease_cost, viols < jnp.maximum(settings.g_max, 2 * viol0))
    ok_mixed = jnp.logical_or(decrease_cost, decrease_viol)
    ok = jnp.where(
        viol0 > settings.g_max, ok_infeasible,
        jnp.where(viol0 < settings.g_min, ok_feasible, ok_mixed))
    return ok & jnp.isfinite(costs) & jnp.isfinite(viols)


def batched_sqp_iteration(model: RobotModel, ocp: OcpConfig, stage: StageData,
                          dt, settings, x_init, X, U,
                          stage_batched: bool = False,
                          backend: str = "auto"):
    """One SQP iteration for B scenarios in lock-step.

    x_init (B, 30); X (B, N+1, 30); U (B, N, 30). ``stage`` either shared
    (no leading axis) or per-scenario (leading B). Returns (X, U, stats) with
    stats = (cost, violation, step_size), each (B,).
    """
    B, N = U.shape[0], U.shape[1]
    if backend == "auto":
        # Batch-major sweep with the lanes-last Pallas Cholesky on TPU
        # (XLA's batched cho_solve is the measured hot spot there); plain
        # batch-major XLA elsewhere.
        backend = "bm_pallas" if jax.default_backend() == "tpu" else "bm_xla"

    stage_axis = 0 if stage_batched else None

    lq = jax.vmap(
        lambda s, Xk, Uk: linearize_ocp(
            model, ocp, s, dt, Xk, Uk, node_chunk=getattr(settings, "lin_chunk", 0),
            sensitivity=getattr(settings, "sensitivity", "frozen"),
            tangents=getattr(settings, "lin_tangents", "f32")),
        in_axes=(stage_axis, 0, 0),
    )(stage, X, U)

    flags = stage.contact_flags[..., :N, :]
    if not stage_batched:
        flags = jnp.broadcast_to(flags, (B, N, 4))

    dx0 = x_init - X[:, 0]
    if backend in ("bm_pallas", "bm_xla", "bm_fused"):
        # Batch-major: ONE (B*N)-batched SPD solve in the projection, and a
        # batch-major Riccati scan (Pallas gain solve on TPU, unrolled to
        # amortize the per-iteration dispatch overhead — both measured,
        # tools/microbench_ops.py).
        # bm_fused keeps the Pallas projection but swaps the Riccati sweep
        # for the single-kernel VMEM-resident version (ops/pallas_riccati)
        sub = "pallas" if backend in ("bm_pallas", "bm_fused") else "xla"
        ric = "fused" if backend == "bm_fused" else sub
        grasp = None
        if U.shape[-1] == 36:
            grasp = stage.grasp_flags[..., :N]
            if not stage_batched:
                grasp = jnp.broadcast_to(grasp, (B, N))
        plq = project_ocp_batched(
            lq, flags, U, shift=settings.hessian_shift, grasp=grasp,
            backend=sub, arm_locked=ocp.arm_locked)
        dX, dU, _, _ = lqr_solve_batched(
            plq, dx0, backend=ric,
            unroll=getattr(settings, "riccati_unroll", 8))
    elif backend == "pallas":
        from ..ops.pallas_lq import solve_lq_batched

        act = cons.velocity_row_mask(flags)
        fm = jnp.repeat(flags, 3, axis=-1)
        dX, dU = solve_lq_batched(
            lq, act, fm, U[:, :, :12], dx0, shift=settings.hessian_shift)
    else:
        grasp_b = None
        if U.shape[-1] == 36:
            grasp_b = stage.grasp_flags[..., :N]
            if not stage_batched:
                grasp_b = jnp.broadcast_to(grasp_b, (B, N))

        def lq_solve_one(lq_k, flags_k, grasp_k, U_k, dx0_k):
            import types

            stage_k = types.SimpleNamespace(
                contact_flags=flags_k, grasp_flags=grasp_k)
            plq = project_ocp(lq_k, stage_k, U_k,
                              shift=settings.hessian_shift,
                              method=settings.projection,
                              arm_locked=ocp.arm_locked)
            dXk, dUk, _, _ = lqr_solve(plq, dx0_k)
            return dXk, dUk

        dX, dU = jax.vmap(lq_solve_one, in_axes=(0, 0, None if grasp_b is None else 0, 0, 0))(
            lq, flags, grasp_b, U, dx0)

    # Baseline merit from linearization byproducts (see sqp.sqp_iteration).
    cost0 = lq.cost                                        # (B,)
    swing = 1.0 - jnp.repeat(flags, 3, axis=-1)
    zero_force_sse = jnp.sum((swing * U[:, :, 0:12]) ** 2, axis=(1, 2))
    if U.shape[-1] == 36:  # force-tracking: zero wrench off-grasp
        g = stage.grasp_flags[..., :N]
        if not stage_batched:
            g = jnp.broadcast_to(g, (B, N))
        zero_force_sse = zero_force_sse + jnp.sum(
            ((1.0 - g[..., None]) * U[:, :, 30:36]) ** 2, axis=(1, 2))
    if ocp.arm_locked:  # quad-only: arm velocity inputs pinned to zero
        zero_force_sse = zero_force_sse + jnp.sum(U[:, :, 24:30] ** 2, axis=(1, 2))
    viol0 = (jnp.sum(lq.d * lq.d, axis=(1, 2))
             + jnp.sum(lq.g0 * lq.g0, axis=(1, 2)) + zero_force_sse)

    # --- early-exit filter linesearch over the alpha grid ------------------
    n_alpha = getattr(settings, "linesearch_steps", 4)
    alphas = settings.max_step * (
        settings.step_reduction ** jnp.arange(n_alpha, dtype=X.dtype))

    eval_batch = jax.vmap(
        lambda s, Xk, Uk: evaluate_trajectory(model, ocp, s, dt, Xk, Uk),
        in_axes=(stage_axis, 0, 0),
    )

    def ls_cond(state):
        i, accepted, _, _, _ = state
        return jnp.logical_and(i < n_alpha, ~jnp.all(accepted))

    def ls_body(state):
        i, accepted, alpha_sel, cost_sel, viol_sel = state
        a = alphas[i]
        costs, viols = eval_batch(stage, X + a * dX, U + a * dU)
        ok = _accept(cost0, viol0, costs, viols, a, settings)
        newly = ok & ~accepted
        alpha_sel = jnp.where(newly, a, alpha_sel)
        cost_sel = jnp.where(newly, costs, cost_sel)
        viol_sel = jnp.where(newly, viols, viol_sel)
        return i + 1, accepted | ok, alpha_sel, cost_sel, viol_sel

    init = (jnp.asarray(0), jnp.zeros((B,), bool), jnp.zeros((B,), X.dtype),
            cost0, viol0)
    _, _, alpha, cost_new, viol_new = jax.lax.while_loop(ls_cond, ls_body, init)

    take = (alpha > 0.0)[:, None, None]
    X_new = jnp.where(take, X + alpha[:, None, None] * dX, X)
    U_new = jnp.where(take, U + alpha[:, None, None] * dU, U)
    X_new = X_new.at[:, 0].set(x_init)
    return X_new, U_new, (cost_new, viol_new, alpha)
