"""Riccati LQ solve over the horizon (HPIPM's role in the reference).

Two interchangeable backends:

- ``riccati_backward`` / ``riccati_forward``: the classic sequential sweep as
  a ``lax.scan`` — O(N) depth, used as the correctness reference and for
  single solves where latency is dominated by per-node cost anyway.
- ``parallel`` (see ops/assoc_riccati.py): associative-scan formulation with
  O(log N) depth for long horizons — the sequence-parallel slot of this
  framework (SURVEY.md §5 long-context analogue).

The LQ problem is defect-aware multiple shooting:
  min  sum_k 1/2 dx'lxx dx + 1/2 du'luu du + du'lux dx + lx'dx + lu'du
       + terminal 1/2 dx'lxx_f dx + lx_f'dx
  s.t. dx_{k+1} = A_k dx_k + B_k du_k + d_k,   dx_0 given.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .transcription import ProjectedLq


def _sym(M):
    return 0.5 * (M + jnp.swapaxes(M, -1, -2))


def riccati_backward(lq: ProjectedLq):
    """Backward sweep. Returns (K (N,nu,nx), kff (N,nu), S0, s0)."""

    def step(carry, inp):
        S, s = carry
        A, B, d, lx, lu, lxx, luu, lux = inp
        Sd_s = S @ d + s
        Qx = lx + A.T @ Sd_s
        Qu = lu + B.T @ Sd_s
        Qxx = lxx + A.T @ S @ A
        Quu = luu + B.T @ S @ B
        Qux = lux + B.T @ S @ A
        chol = jax.scipy.linalg.cho_factor(_sym(Quu))
        K = -jax.scipy.linalg.cho_solve(chol, Qux)
        kff = -jax.scipy.linalg.cho_solve(chol, Qu)
        S_new = _sym(Qxx + Qux.T @ K)
        s_new = Qx + Qux.T @ kff
        return (S_new, s_new), (K, kff)

    init = (lq.lxx_f, lq.lx_f)
    inputs = (lq.A, lq.B, lq.d, lq.lx, lq.lu, lq.lxx, lq.luu, lq.lux)
    (S0, s0), (K, kff) = jax.lax.scan(step, init, inputs, reverse=True)
    return K, kff, S0, s0


def riccati_forward(lq: ProjectedLq, K, kff, dx0):
    """Forward rollout of the LQ solution.

    Returns (dX (N+1,nx), dU_red (N,nu), dU (N, 30)) where dU applies the
    input-recovery map du = p + Pu u_red + Px dx.
    """

    def step(dx, inp):
        A, B, d, Kk, kk, p, Pu, Px = inp
        u_red = kk + Kk @ dx
        du = p + Pu @ u_red + Px @ dx
        dx_next = A @ dx + B @ u_red + d
        return dx_next, (dx, u_red, du)

    inputs = (lq.A, lq.B, lq.d, K, kff, lq.p, lq.Pu, lq.Px)
    dxN, (dX, dU_red, dU) = jax.lax.scan(step, dx0, inputs)
    dX = jnp.concatenate([dX, dxN[None]], axis=0)
    return dX, dU_red, dU


def lqr_solve(lq: ProjectedLq, dx0):
    """Convenience: backward + forward. Returns (dX, dU, K, kff)."""
    K, kff, _, _ = riccati_backward(lq)
    dX, _, dU = riccati_forward(lq, K, kff, dx0)
    return dX, dU, K, kff


# ---------------------------------------------------------------------------
# Batch-major sweeps (production batched path)
# ---------------------------------------------------------------------------
#
# vmapping the per-scenario sweep leaves XLA's batched cho_factor+cho_solve
# on the critical path: ~840 us marginal per scan step at (256,30,31) — 40x
# the batched matmuls it sits between — while the lanes-last Pallas kernel
# (ops/pallas_chol.spd_solve) does the same solve at ~0 marginal
# (tools/microbench_ops.py, v5e). The batch-major formulation lets that
# kernel (which has no batching rule) sit inside the scan directly:
# riccati backward+forward measured 288 -> 69 us/solve at batch 512.
# ``unroll`` trades compile time for per-iteration overhead; that overhead is
# a host-dispatch artifact only — in-graph, unroll=1 is fastest (69 vs 134
# us/solve at unroll=8, tools/profile_solve.py) and compiles quickest.

def _gain_solve(Quu, rhs, backend: str):
    if backend == "pallas":
        from ..ops.pallas_chol import spd_solve

        return spd_solve(Quu, rhs)

    def one(q, r):
        chol = jax.scipy.linalg.cho_factor(q)
        return jax.scipy.linalg.cho_solve(chol, r)

    return jax.vmap(one)(Quu, rhs)


def riccati_backward_batched(lq: ProjectedLq, backend: str = "xla",
                             unroll: int = 1):
    """Backward sweep over (B, N, ...) LQ data. Returns K (B,N,nu,nx),
    kff (B,N,nu).

    The per-step contractions run as broadcast multiply+sum (spatial.fmm):
    a (B,30,30) dot_general pads the 30-lane axis to 128 on the MXU, and the
    scan body is bandwidth-bound on those small matrices (docs/PERF.md
    finding #1 — same as the FK chain and the projection)."""
    from ..models.spatial import fmm, fmv

    nx = lq.A.shape[-1]

    def step(carry, inp):
        S, s = carry
        A, AT, B, BT, d, lx, lu, lxx, luu, lux = inp
        Sd_s = fmv(S, d) + s
        Qx = lx + fmv(AT, Sd_s)
        Qu = lu + fmv(BT, Sd_s)
        SA = fmm(S, A)
        SB = fmm(S, B)
        Qxx = lxx + fmm(AT, SA)
        Quu = luu + fmm(BT, SB)
        Qux = lux + fmm(BT, SA)
        Quu = 0.5 * (Quu + jnp.swapaxes(Quu, -1, -2))
        rhs = jnp.concatenate([Qux, Qu[..., None]], axis=-1)
        sol = -_gain_solve(Quu, rhs, backend)
        K, kff = sol[..., :nx], sol[..., nx]
        QuxT = jnp.swapaxes(Qux, -1, -2)
        S_new = Qxx + fmm(QuxT, K)
        S_new = 0.5 * (S_new + jnp.swapaxes(S_new, -1, -2))
        s_new = Qx + fmv(QuxT, kff)
        return (S_new, s_new), (K, kff)

    AT = jnp.swapaxes(lq.A, -1, -2)
    BT = jnp.swapaxes(lq.B, -1, -2)
    inputs = jax.tree.map(
        lambda x: jnp.swapaxes(x, 0, 1),
        (lq.A, AT, lq.B, BT, lq.d, lq.lx, lq.lu, lq.lxx, lq.luu, lq.lux),
    )
    (S0, s0), (K, kff) = jax.lax.scan(
        step, (lq.lxx_f, lq.lx_f), inputs, reverse=True, unroll=unroll
    )
    return jnp.swapaxes(K, 0, 1), jnp.swapaxes(kff, 0, 1)


def riccati_forward_batched(lq: ProjectedLq, K, kff, dx0, unroll: int = 1):
    """Forward rollout over (B, N, ...). Returns (dX (B,N+1,nx), dU (B,N,nu_full)).

    Input recovery runs in the dense form (du = p + Pu u_red + Px dx) or the
    structured form when the projection carried blocks (transcription.
    _apply_projection_structured): force/wrench dims are elementwise gates,
    only the 18 joint-velocity dims need matmuls."""
    from ..models.spatial import fmv

    structured = lq.P is not None

    def recover(dx, u_red, p, Pu, Px, P, Px_v, fm, g):
        if not structured:
            return p + fmv(Pu, u_red) + fmv(Px, dx)
        du_F = fm * u_red[..., 0:12]
        du_v = fmv(P, u_red[..., 12:30]) + fmv(Px_v, dx)
        parts = [du_F, du_v]
        if g is not None:
            parts.append(g * u_red[..., 30:36])
        return p + jnp.concatenate(parts, axis=-1)

    def step(dx, inp):
        A, B, d, Kk, kk, p, Pu, Px, P, Px_v, fm, g = inp
        u_red = kk + fmv(Kk, dx)
        du = recover(dx, u_red, p, Pu, Px, P, Px_v, fm, g)
        dx_next = fmv(A, dx) + fmv(B, u_red) + d
        return dx_next, (dx, du)

    swap = lambda x: None if x is None else jnp.swapaxes(x, 0, 1)
    inputs = tuple(
        swap(x) for x in (lq.A, lq.B, lq.d, K, kff, lq.p, lq.Pu, lq.Px,
                          lq.P, lq.Px_v, lq.force_mask, lq.grasp_gate)
    )
    dxN, (dX, dU) = jax.lax.scan(step, dx0, inputs, unroll=unroll)
    dX = jnp.concatenate([jnp.swapaxes(dX, 0, 1), dxN[:, None]], axis=1)
    return dX, jnp.swapaxes(dU, 0, 1)


def lqr_solve_batched(lq: ProjectedLq, dx0, backend: str = "xla",
                      unroll: int = 1):
    """Batch-major backward + forward. lq leaves carry (B, N, ...); dx0 (B, nx).

    backend "fused" runs the whole backward sweep as ONE Pallas kernel with
    the carry resident in VMEM (ops/pallas_riccati) — the scan formulation
    measured 15% of speed-of-light (docs/PERF.md roofline), occupancy-bound
    on its small per-step kernels."""
    if backend == "fused":
        from ..ops.pallas_riccati import riccati_backward_fused_lq

        K, kff = riccati_backward_fused_lq(lq)
    else:
        K, kff = riccati_backward_batched(lq, backend=backend, unroll=unroll)
    dX, dU = riccati_forward_batched(lq, K, kff, dx0, unroll=unroll)
    return dX, dU, K, kff
