"""SQP MPC solver: linearize -> project -> Riccati -> linesearch.

Replaces ocs2_sqp (MultipleShootingSolver / SqpMpc) with the task.info sqp
settings: dt 0.015, 1 SQP iteration per MPC solve, RK2 integration, projected
state-input equalities, relaxed-barrier inequality handling in the cost,
filter-style linesearch (g_max 1e-2, g_min 1e-6).

Everything here is jit-compatible with fixed shapes; batching over scenarios
is an outer vmap. The warm-start shift runs in pure JAX too so the MPC loop
stays on-device.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import struct

from ..models.model import RobotModel
from ..ocp import constraints as cons
from ..ocp.problem import OcpConfig, StageData, stage_cost, terminal_cost
from .riccati import lqr_solve, riccati_forward
from .transcription import linearize_ocp, project_ocp, rk2_step


@struct.dataclass
class SqpSolution:
    """Primal solution of one MPC solve."""

    times: jnp.ndarray  # (N+1,)
    X: jnp.ndarray      # (N+1, 30)
    U: jnp.ndarray      # (N, 30)
    cost: jnp.ndarray
    constraint_violation: jnp.ndarray
    step_size: jnp.ndarray


def evaluate_trajectory(model: RobotModel, ocp: OcpConfig, stage: StageData, dt, X, U):
    """(cost, violation_sse) of a trajectory — the linesearch merit pieces.

    violation = dynamics defects SSE + projected equality constraint SSE
    (foot-velocity rows + swing-foot forces), matching the OCS2 filter
    linesearch's equality metric.
    """
    N = U.shape[0]
    ks = jnp.arange(N)

    def node_cost(k, x, u):
        return stage_cost(model, ocp, stage, k, x, u)

    costs = jax.vmap(node_cost)(ks, X[:-1], U)
    total_cost = dt * jnp.sum(costs) + terminal_cost(model, ocp, stage, X[-1])

    def node_defect(x, u, x_next):
        return rk2_step(model, x, u, dt) - x_next

    defects = jax.vmap(partial(node_defect))(X[:-1], U, X[1:])

    def node_eq(k, x, u):
        g = cons.velocity_constraint(
            model, x, u, stage.contact_flags[k], stage.z_vel_ref[k]
        )
        swing = 1.0 - jnp.repeat(stage.contact_flags[k], 3)
        zero_force = swing * u[0:12]
        sse = jnp.sum(g * g) + jnp.sum(zero_force * zero_force)
        if u.shape[-1] == 36:  # force-tracking: zero wrench off-grasp
            zero_wrench = (1.0 - stage.grasp_flags[k]) * u[30:36]
            sse = sse + jnp.sum(zero_wrench * zero_wrench)
        if ocp.arm_locked:  # quad-only: arm velocity inputs pinned to zero
            sse = sse + jnp.sum(u[24:30] * u[24:30])
        return sse

    eq_sse = jnp.sum(jax.vmap(node_eq)(ks, X[:-1], U))
    violation = jnp.sum(defects * defects) + eq_sse
    return total_cost, violation


def _linesearch(model, ocp, stage, dt, X, U, dX, dU, cost0, viol0, settings):
    """Filter-style linesearch over a fixed geometric alpha grid, evaluated in
    parallel (one batched trajectory evaluation instead of a sequential trial
    loop — same accept logic, TPU-friendly)."""
    n_alpha = getattr(settings, "linesearch_steps", 4)
    alphas = settings.max_step * (settings.step_reduction ** jnp.arange(n_alpha))

    def trial(alpha):
        Xt = X + alpha * dX
        Ut = U + alpha * dU
        c, v = evaluate_trajectory(model, ocp, stage, dt, Xt, Ut)
        return c, v

    # lax.map (not vmap): trial evaluations run sequentially; a vmapped alpha
    # axis measured no faster (434 vs 445 solves/s at batch 512) and costs
    # peak memory, so keep the sequential sweep.
    costs, viols = jax.lax.map(trial, alphas)

    g_max, g_min = settings.g_max, settings.g_min
    armijo = settings.armijo_factor

    # OCS2 FilterLinesearch acceptance:
    #  - infeasible baseline (viol0 > g_max): require violation decrease
    #  - feasible baseline  (viol0 < g_min): require cost decrease (Armijo-ish)
    #  - otherwise: accept if cost or violation improves
    decrease_viol = viols < (1.0 - 1e-3) * viol0
    decrease_cost = costs < cost0 - armijo * alphas * jnp.abs(cost0)
    ok_infeasible = decrease_viol
    ok_feasible = jnp.logical_and(decrease_cost, viols < jnp.maximum(g_max, 2 * viol0))
    ok_mixed = jnp.logical_or(decrease_cost, decrease_viol)
    accepted = jnp.where(
        viol0 > g_max, ok_infeasible, jnp.where(viol0 < g_min, ok_feasible, ok_mixed)
    )
    # also never accept non-finite trials
    finite = jnp.isfinite(costs) & jnp.isfinite(viols)
    accepted = accepted & finite

    any_ok = jnp.any(accepted)
    first = jnp.argmax(accepted)  # largest alpha first in the grid
    alpha = jnp.where(any_ok, alphas[first], 0.0)
    cost_new = jnp.where(any_ok, costs[first], cost0)
    viol_new = jnp.where(any_ok, viols[first], viol0)
    return alpha, cost_new, viol_new


def sqp_iteration(model: RobotModel, ocp: OcpConfig, stage: StageData, dt, settings,
                  x_init, X, U):
    """One full SQP iteration. Returns updated (X, U, stats)."""
    lq = linearize_ocp(
        model, ocp, stage, dt, X, U, node_chunk=getattr(settings, "lin_chunk", 0),
        sensitivity=getattr(settings, "sensitivity", "frozen"),
        tangents=getattr(settings, "lin_tangents", "f32"),
    )
    plq = project_ocp(
        lq, stage, U, shift=settings.hessian_shift, method=settings.projection,
        arm_locked=ocp.arm_locked,
    )
    dx0 = x_init - X[0]
    if settings.riccati == "parallel":
        from .parallel_riccati import parallel_riccati_backward

        K, kff = parallel_riccati_backward(plq)
        dX, _, dU = riccati_forward(plq, K, kff, dx0)
    else:
        dX, dU, K, kff = lqr_solve(plq, dx0)

    # Baseline merit comes free from the linearization byproducts: lq.cost is
    # the exact current cost, lq.d the RK2 defects, lq.g0 the masked velocity
    # equalities; only the swing zero-force term needs recomputing.
    cost0 = lq.cost
    swing = 1.0 - jnp.repeat(stage.contact_flags[: U.shape[0]], 3, axis=-1)
    zero_force_sse = jnp.sum((swing * U[:, 0:12]) ** 2)
    if U.shape[-1] == 36:  # force-tracking: zero wrench off-grasp
        off = 1.0 - stage.grasp_flags[: U.shape[0], None]
        zero_force_sse = zero_force_sse + jnp.sum((off * U[:, 30:36]) ** 2)
    if ocp.arm_locked:  # quad-only: arm velocity inputs pinned to zero
        zero_force_sse = zero_force_sse + jnp.sum(U[:, 24:30] ** 2)
    viol0 = jnp.sum(lq.d * lq.d) + jnp.sum(lq.g0 * lq.g0) + zero_force_sse
    alpha, cost_new, viol_new = _linesearch(
        model, ocp, stage, dt, X, U, dX, dU, cost0, viol0, settings
    )
    # Always move the initial state to the measured one (the dx0 step is not
    # optional — OCS2 enforces the initial-state equality exactly).
    # Guard the alpha = 0 (rejected step) case with where: a non-finite dX
    # would otherwise poison the iterate via 0 * NaN.
    take = alpha > 0.0
    X_new = jnp.where(take, X + alpha * dX, X)
    U_new = jnp.where(take, U + alpha * dU, U)
    X_new = X_new.at[0].set(x_init)
    return X_new, U_new, (cost_new, viol_new, alpha)


class _SqpSettingsStatic(NamedTuple):
    """Hashable subset of SqpSettings used inside jit."""

    dt: float
    sqp_iterations: int
    g_max: float
    g_min: float
    armijo_factor: float
    max_step: float
    min_step: float
    step_reduction: float
    hessian_shift: float
    projection: str = "chol"
    riccati: str = "scan"
    linesearch_steps: int = 4
    lin_chunk: int = 0
    riccati_unroll: int = 1  # batch-major sweeps only (riccati.py)
    sensitivity: str = "frozen"  # RK2 discrete-sensitivity mode (config.py)
    lin_tangents: str = "f32"  # AD tangent dtype, "f32" | "bf16" (config.py)


def _settings_static(cfg_sqp) -> "_SqpSettingsStatic":
    return _SqpSettingsStatic(
        dt=cfg_sqp.dt,
        sqp_iterations=cfg_sqp.sqp_iterations,
        g_max=cfg_sqp.g_max,
        g_min=cfg_sqp.g_min,
        armijo_factor=cfg_sqp.armijo_factor,
        max_step=cfg_sqp.max_step,
        min_step=cfg_sqp.min_step,
        step_reduction=cfg_sqp.step_reduction,
        hessian_shift=cfg_sqp.hessian_shift,
        projection=getattr(cfg_sqp, "projection", "chol"),
        riccati=getattr(cfg_sqp, "riccati", "scan"),
        linesearch_steps=getattr(cfg_sqp, "linesearch_steps", 4),
        lin_chunk=getattr(cfg_sqp, "lin_chunk", 0),
        riccati_unroll=getattr(cfg_sqp, "riccati_unroll", 8),
        sensitivity=getattr(cfg_sqp, "sensitivity", "frozen"),
        lin_tangents=getattr(cfg_sqp, "lin_tangents", "f32"),
    )


class SqpSolver:
    """MPC-mode SQP solver (SqpMpc equivalent).

    Holds the static problem definition; ``solve`` is a jitted pure function
    of (stage data, initial state, warm start).
    """

    def __init__(self, model: RobotModel, ocp: OcpConfig, cfg):
        self.model = model
        self.ocp = ocp
        self.cfg = cfg
        self.settings = _settings_static(cfg.sqp)
        self.n_intervals = int(round(cfg.mpc.time_horizon / cfg.sqp.dt))
        self._solve = jax.jit(self._solve_impl)

    def cold_start(self, stage: StageData, x_init):
        """Initializer trajectory: constant state, weight-compensating input
        (QMInitializer::compute)."""
        N = self.n_intervals
        X = jnp.tile(x_init[None], (N + 1, 1))
        U = stage.u_nom[:N]
        return X, U

    def warm_start(self, prev_times, prev_X, prev_U, new_times):
        """Shift the previous solution onto the new grid (MPC warm start)."""
        N = self.n_intervals

        def interp_state(t):
            idx = jnp.clip(
                jnp.searchsorted(prev_times, t, side="right") - 1, 0, prev_times.shape[0] - 2
            )
            t0, t1 = prev_times[idx], prev_times[idx + 1]
            a = jnp.clip((t - t0) / jnp.maximum(t1 - t0, 1e-9), 0.0, 1.0)
            return (1 - a) * prev_X[idx] + a * prev_X[idx + 1]

        def interp_input(t):
            idx = jnp.clip(
                jnp.searchsorted(prev_times[:-1], t, side="right") - 1, 0, prev_U.shape[0] - 1
            )
            return prev_U[idx]

        X = jax.vmap(interp_state)(new_times)
        U = jax.vmap(interp_input)(new_times[:N])
        return X, U

    def _solve_impl(self, stage: StageData, x_init, X0, U0):
        def body(carry, _):
            X, U = carry
            X, U, stats = sqp_iteration(
                self.model, self.ocp, stage, self.settings.dt, self.settings, x_init, X, U
            )
            return (X, U), stats

        (X, U), stats = jax.lax.scan(
            body, (X0, U0), None, length=self.settings.sqp_iterations
        )
        cost, viol, alpha = jax.tree.map(lambda s: s[-1], stats)
        return SqpSolution(
            times=stage.times, X=X, U=U, cost=cost,
            constraint_violation=viol, step_size=alpha,
        )

    def solve(self, stage: StageData, x_init, warm=None) -> SqpSolution:
        """One MPC solve. ``warm``: optional (times, X, U) from previous solve."""
        if warm is None:
            X0, U0 = self.cold_start(stage, x_init)
        else:
            prev_times, prev_X, prev_U = warm
            X0, U0 = self.warm_start(prev_times, prev_X, prev_U, stage.times)
            X0 = X0.at[0].set(x_init)
        return self._solve(stage, x_init, X0, U0)
