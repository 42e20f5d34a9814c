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
