"""Fully on-device batched closed-loop rollouts: MPC-as-policy at scale.

The north-star workload (BASELINE.json config #5): thousands of
domain-randomized scenarios (initial-state perturbations, pushes, payloads)
each running the complete stack — sim (1 kHz) + WBC (500 Hz) + SQP MPC
(100 Hz) — in lock-step on the accelerator. One ``lax.scan`` iteration = one
MPC cycle (1 solve + mpc_decim physics steps with control_decim-paced WBC
ticks), vmapped over the scenario batch.

Failure handling (SURVEY.md §5 failure-detection parity): scenarios whose
safety check trips or whose solve goes non-finite are frozen in place
(per-scenario quarantine) instead of poisoning the batch; the ``alive`` mask
reports survivors over time.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from flax import struct

from ..models import centroidal
from ..models.model import RobotModel
from ..ocp.problem import StageData
from ..runtime.mrt import PolicyStore, evaluate_policy
from ..runtime.safety import safety_check
from ..solver.sqp import SqpSolver, sqp_iteration
from ..wbc.wbc import WbcState, hierarchical_wbc_batched
from .sim import SimConfig, SimState, measured_rbd, sim_init, sim_step


@struct.dataclass
class RolloutCarry:
    sim: SimState            # batched (leading B on every leaf)
    X: jnp.ndarray           # (B, N+1, 30) MPC warm start
    U: jnp.ndarray           # (B, N, 30)
    input_last: jnp.ndarray  # (B, 30) WBC finite-difference memory
    command: jnp.ndarray     # (B, 5, 18) latest hybrid command
    alive: jnp.ndarray       # (B,) bool


@struct.dataclass
class RolloutLog:
    base_pose: jnp.ndarray   # (T, B, 6)
    mpc_cost: jnp.ndarray    # (T, B)
    mpc_viol: jnp.ndarray    # (T, B)
    alive: jnp.ndarray       # (T, B)


def _flags_at(stage: StageData, t):
    idx = jnp.clip(
        jnp.searchsorted(stage.times, t, side="right") - 1,
        0, stage.times.shape[0] - 1,
    )
    return stage.contact_flags[idx]


class BatchedClosedLoop:
    """Compile once, roll out B scenarios for T MPC cycles on device."""

    def __init__(self, model: RobotModel, cfg, solver: SqpSolver,
                 sim_cfg: SimConfig = SimConfig(),
                 control_decim: int = 2, mpc_decim: int = 10,
                 solve_chunk: int = 0, cycle_chunk: int = 0):
        self.model = model
        self.cfg = cfg
        self.solver = solver
        self.sim_cfg = sim_cfg
        self.control_decim = control_decim
        self.mpc_decim = mpc_decim
        # solve_chunk > 0 runs the MPC solve stage in lax.map chunks of that
        # many scenarios: the linearize/LQ workspace is the rollout's HBM
        # peak (~2.5 GB per 1024 scenarios at 67 nodes) and the rollout is
        # sim/WBC-dominated (solve is ~8% of cycle time at batch 1024), so
        # chunking the solve lifts the scenario ceiling (2048/4096 faulted
        # the device un-chunked on one v5e) at negligible throughput cost.
        self.solve_chunk = solve_chunk
        # cycle_chunk > 0 additionally chunks the WHOLE cycle (solve +
        # physics + WBC): on the tunneled v5e, batches > 1024 hit an opaque
        # runtime 'TPU device error' even with the solve chunked and the
        # compiled temp footprint at 5.6 GB (docs/PERF.md) — some op in the
        # physics/WBC stage faults above 1024 scenarios, so no stage is
        # allowed to see more than cycle_chunk at once. Requires
        # B % cycle_chunk == 0.
        self.cycle_chunk = cycle_chunk
        self._run = jax.jit(self._run_impl)

    def init_carry(self, stage0: StageData, q0_batch, v0_batch=None) -> RolloutCarry:
        B = q0_batch.shape[0]
        dtype = q0_batch.dtype
        sim = jax.vmap(lambda q, v: sim_init(self.model, q, v, self.sim_cfg))(
            q0_batch,
            jnp.zeros((B, 24), dtype=dtype) if v0_batch is None else v0_batch,
        )
        rbd = jax.vmap(partial(measured_rbd, self.model))(sim)
        x_obs = jax.vmap(partial(centroidal.centroidal_state_from_rbd, self.model))(rbd)
        N = self.solver.n_intervals
        X = jnp.tile(x_obs[:, None, :], (1, N + 1, 1))
        U = jnp.broadcast_to(stage0.u_nom[:N], (B, N, 30)) + 0.0
        # initial command: hold measured joints, modest PD
        q_j = q0_batch[:, 6:24]
        command = jnp.stack(
            [q_j, jnp.zeros_like(q_j), jnp.full_like(q_j, 60.0),
             jnp.full_like(q_j, 3.0), jnp.zeros_like(q_j)], axis=1,
        )
        return RolloutCarry(
            sim=sim, X=X, U=U,
            input_last=jnp.zeros((B, 30), dtype=dtype),
            command=command,
            alive=jnp.ones((B,), dtype=bool),
        )

    def _control_tick(self, stage, X, U, sim, input_last, t_local, ctrl_period):
        """One batched WBC tick -> (command (B,5,18), input_last)."""
        model = self.model
        wbc_cfg = self.cfg.wbc
        flags = _flags_at(stage, t_local)
        rbd = jax.vmap(partial(measured_rbd, model))(sim)

        def eval_one(Xi, Ui):
            policy = PolicyStore(times=stage.times, X=Xi, U=Ui)
            return evaluate_policy(policy, t_local)

        x_opt, u_opt = jax.vmap(eval_one)(X, U)
        flags_b = jnp.broadcast_to(flags, (X.shape[0],) + flags.shape)
        cmd, new_state = hierarchical_wbc_batched(
            model, wbc_cfg, x_opt, u_opt, rbd, flags_b,
            WbcState(input_last=input_last), ctrl_period, use_arm_init=False,
        )
        il_new = new_state.input_last
        tau = cmd[:, 36:54]
        dtype = tau.dtype
        B = tau.shape[0]
        pos_des = x_opt[:, 12:30]
        vel_des = jnp.concatenate(
            [u_opt[:, 12:24], jnp.zeros((B, 6), dtype=dtype)], axis=1
        )
        kp = jnp.zeros((B, 18), dtype=dtype)
        kd = jnp.concatenate(
            [jnp.full((B, 12), self.cfg.controller.leg_kd, dtype=dtype),
             jnp.full((B, 6), self.cfg.controller.arm_kd, dtype=dtype)], axis=1,
        )
        command = jnp.stack([pos_des, vel_des, kp, kd, tau], axis=1)
        return command, il_new

    def _mpc_cycle(self, carry: RolloutCarry, stage_and_wrench):
        stage, wrench = stage_and_wrench
        model, solver = self.model, self.solver
        sim_cfg = self.sim_cfg
        ctrl_period = sim_cfg.dt * self.control_decim

        rbd = jax.vmap(partial(measured_rbd, model))(carry.sim)
        x_obs = jax.vmap(partial(centroidal.centroidal_state_from_rbd, model))(rbd)

        # warm-start shift onto the new grid, then one SQP iteration (100 Hz)
        def shift(Xw, Uw):
            prev_times = stage.times - sim_cfg.dt * self.mpc_decim
            return solver.warm_start(prev_times, Xw, Uw, stage.times)

        Xw, Uw = jax.vmap(shift)(carry.X, carry.U)
        Xw = Xw.at[:, 0].set(x_obs)

        def solve_one(x0, Xi, Ui):
            return sqp_iteration(
                model, solver.ocp, stage, solver.settings.dt, solver.settings,
                x0, Xi, Ui,
            )

        B = x_obs.shape[0]
        if self.solve_chunk and self.solve_chunk < B:
            X, U, (cost, viol, alpha) = jax.lax.map(
                lambda args: solve_one(*args),
                (x_obs, Xw, Uw), batch_size=self.solve_chunk,
            )
        else:
            X, U, (cost, viol, alpha) = jax.vmap(solve_one)(x_obs, Xw, Uw)

        def physics_block(inner, step_idx):
            sim, input_last, command = inner
            t_local = stage.times[0] + step_idx * sim_cfg.dt

            def do_tick(_):
                return self._control_tick(
                    stage, X, U, sim, input_last, t_local, ctrl_period
                )

            command, input_last = jax.lax.cond(
                (step_idx % self.control_decim) == 0,
                do_tick, lambda _: (command, input_last), None,
            )
            sim_new = jax.vmap(
                lambda s, c, w: sim_step(model, sim_cfg, s, c, external_wrench=w)
            )(sim, command, wrench)
            return (sim_new, input_last, command), None

        (sim_new, input_last, command), _ = jax.lax.scan(
            physics_block, (carry.sim, carry.input_last, carry.command),
            jnp.arange(self.mpc_decim),
        )

        # per-scenario quarantine
        safe = jax.vmap(safety_check)(x_obs) & jnp.isfinite(cost)
        finite_state = jnp.all(jnp.isfinite(sim_new.q), axis=-1)
        alive = carry.alive & safe & finite_state

        def freeze(new, old):
            expand = (slice(None),) + (None,) * (new.ndim - 1)
            return jnp.where(alive[expand], new, old)

        sim_out = jax.tree.map(freeze, sim_new, carry.sim)
        new_carry = RolloutCarry(
            sim=sim_out, X=freeze(X, carry.X), U=freeze(U, carry.U),
            input_last=freeze(input_last, carry.input_last),
            command=freeze(command, carry.command),
            alive=alive,
        )
        return new_carry, (sim_out.q[:, 0:6], cost, viol, alive)

    def _mpc_cycle_chunked(self, carry: RolloutCarry, stage_and_wrench):
        """_mpc_cycle with every stage capped at cycle_chunk scenarios."""
        stage, wrench = stage_and_wrench
        B = carry.alive.shape[0]
        c = self.cycle_chunk
        G = B // c
        assert G * c == B, (B, c)

        def split(x):
            return x.reshape(G, c, *x.shape[1:])

        def unsplit(x):
            # inputs are (G, c, ...) from lax.map — merge the chunk axes
            return x.reshape(G * c, *x.shape[2:])

        carry_r = jax.tree.map(split, carry)
        wrench_r = split(wrench)
        new_r, out_r = jax.lax.map(
            lambda cw: self._mpc_cycle(cw[0], (stage, cw[1])),
            (carry_r, wrench_r),
        )
        return jax.tree.map(unsplit, new_r), jax.tree.map(unsplit, out_r)

    def _run_impl(self, stages: StageData, carry: RolloutCarry, wrenches):
        """stages: StageData stacked along a leading (T, ...) cycle axis;
        wrenches: (T, B, 6) per-cycle per-scenario base disturbance."""
        B = carry.alive.shape[0]
        cycle = self._mpc_cycle
        if self.cycle_chunk and self.cycle_chunk < B:
            cycle = self._mpc_cycle_chunked
        carry, (base, cost, viol, alive) = jax.lax.scan(
            cycle, carry, (stages, wrenches)
        )
        return carry, RolloutLog(base_pose=base, mpc_cost=cost, mpc_viol=viol, alive=alive)

    def run(self, stages: StageData, carry: RolloutCarry, wrenches=None):
        """``wrenches`` (T, B, 6), world-frame force/torque on the base per
        MPC cycle — the domain-randomization channel for pushes (transient
        lateral force) and payloads (persistent -z force). None = undisturbed."""
        if wrenches is None:
            T = stages.times.shape[0]
            B = carry.alive.shape[0]
            dtype = carry.sim.q.dtype
            wrenches = jnp.zeros((T, B, 6), dtype=dtype)
        return self._run(stages, carry, wrenches)


def stack_stages(model, cfg, schedule, targets, t0, n_cycles, mpc_period, dtype):
    """Precompile per-cycle StageData and stack along a leading time axis."""
    from ..ocp.problem import build_stage_data

    stages = [
        build_stage_data(model, cfg, schedule, targets, t0 + i * mpc_period, dtype=dtype)
        for i in range(n_cycles)
    ]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *stages)
