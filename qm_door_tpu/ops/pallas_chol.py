"""Pallas TPU kernel: batched small SPD solve (Cholesky + two substitutions).

The framework's hot loops factor thousands of small (n <= ~40) SPD systems
per step — Riccati gain solves (Quu), the equality-projection Gram matrices,
and the WBC interior-point KKT systems. XLA lowers small batched
``cholesky``/``triangular_solve`` to loopy per-matrix code; this kernel keeps
the whole batch resident in VMEM in a lanes-last layout (n, n, B_tile) so
every scalar operation of the factorization is a 128-lane VPU vector op, and
the k-loop is fully unrolled at trace time (n is static).

API: ``spd_solve(A, Y)`` with A (B, n, n) SPD, Y (B, n, m) -> X = A^{-1} Y.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BATCH_TILE = 128


def _chol_solve_kernel(a_ref, y_ref, x_ref, l_ref, z_ref, *, n, m, shift):
    # load (n, n, BT) and factor in-place into l_ref
    A = a_ref[:]  # (n, n, BT)
    eye_shift = shift

    # right-looking Cholesky, unrolled over the static dimension n
    for k in range(n):
        akk = A[k, k, :] + eye_shift
        inv_d = jax.lax.rsqrt(jnp.maximum(akk, 1e-30))
        col = A[:, k, :] * inv_d[None, :]      # (n, BT)
        # Store column k of L. Entries above the diagonal (rows < k) hold
        # stale values but are never read by the substitutions below.
        l_ref[:, k, :] = col
        if k + 1 < n:
            sub = col[k + 1 :, :]              # (n-k-1, BT)
            A = A.at[k + 1 :, k + 1 :, :].add(
                -sub[:, None, :] * sub[None, :, :]
            )

    L = l_ref[:]  # (n, n, BT), column j holds L[:, j]

    # forward substitution: L z = Y  (z in z_ref, (n, m, BT))
    Z = y_ref[:]
    for i in range(n):
        zi = Z[i, :, :] / L[i, i, :][None, :]
        Z = Z.at[i, :, :].set(zi)
        if i + 1 < n:
            Z = Z.at[i + 1 :, :, :].add(
                -L[i + 1 :, i, :][:, None, :] * zi[None, :, :]
            )

    # backward substitution: L^T x = z
    X = Z
    for i in reversed(range(n)):
        xi = X[i, :, :] / L[i, i, :][None, :]
        X = X.at[i, :, :].set(xi)
        if i > 0:
            # L^T[j, i] = L[i, j] for j < i
            X = X.at[:i, :, :].add(-L[i, :i, :][:, None, :] * xi[None, :, :])

    x_ref[:] = X


@partial(jax.jit, static_argnames=("interpret", "shift"))
def spd_solve(A, Y, shift: float = 0.0, interpret: bool = False):
    """Solve A X = Y for a batch of SPD matrices.

    A: (B, n, n); Y: (B, n, m). Returns X (B, n, m). ``shift`` adds a
    diagonal Levenberg term before factorization.
    """
    B, n, _ = A.shape
    m = Y.shape[-1]
    bt = min(BATCH_TILE, B)
    if B % bt != 0:
        pad = bt - B % bt
        A = jnp.concatenate([A, jnp.tile(jnp.eye(n, dtype=A.dtype)[None], (pad, 1, 1))])
        Y = jnp.concatenate([Y, jnp.zeros((pad, n, m), dtype=Y.dtype)])
    Bp = A.shape[0]

    At = jnp.transpose(A, (1, 2, 0))  # (n, n, Bp)
    Yt = jnp.transpose(Y, (1, 2, 0))  # (n, m, Bp)

    grid = (Bp // bt,)
    out = pl.pallas_call(
        partial(_chol_solve_kernel, n=n, m=m, shift=shift),
        out_shape=jax.ShapeDtypeStruct((n, m, Bp), A.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((n, n, bt), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, m, bt), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n, m, bt), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((n, n, bt), A.dtype),
            pltpu.VMEM((n, m, bt), A.dtype),
        ],
        interpret=interpret,
    )(At, Yt)

    X = jnp.transpose(out, (2, 0, 1))[:B]
    return X


def spd_solve_reference(A, Y, shift: float = 0.0):
    """XLA reference implementation (vmapped cho_solve)."""

    def one(a, y):
        chol = jax.scipy.linalg.cho_factor(a + shift * jnp.eye(a.shape[0], dtype=a.dtype))
        return jax.scipy.linalg.cho_solve(chol, y)

    return jax.vmap(one)(A, Y)
