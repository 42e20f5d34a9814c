"""Pallas TPU kernel: batched small SPD solve (Cholesky + two substitutions).

The solver's dominant primitive is NOT the batched matmul but the batched
Cholesky gain solve: at (256, 30, 30/31) XLA's cho_factor+cho_solve measured
~900 us marginal device time vs ~20 us for a batched matmul
(tools/microbench_ops.py, v5e). This kernel keeps a batch tile resident in
VMEM in a lanes-last layout (n, n, B_tile) so every scalar operation of the
factorization is a full-width VPU vector op, with the k-loop unrolled at
trace time (n is static).

Implementation note: all updates are masked whole-array ops (iota compares +
where) — slice-assignment ``.at[k:, k:].add`` lowers to scatter-add, which
Mosaic rejects (KernelType.TC has no scatter).

API: ``spd_solve(A, Y)`` with A (B, n, n) SPD, Y (B, n, m) -> X = A^{-1} Y.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BATCH_TILE = 128


def _chol_t(M, n, guard=1e-30):
    """Unrolled Cholesky of a SYMMETRIC (n, n, Bt) batch.

    Returns Lt with Lt[k] = column k of L (k-major layout, strictly lower:
    entries above the diagonal are zeroed). Exploits symmetry so the pivot
    column is read as row A[k] (outer slice); the masked full outer-product
    Schur update keeps A exactly symmetric, so the trick stays valid."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    A = M
    cols = []
    for k in range(n):
        inv_d = jax.lax.rsqrt(jnp.maximum(A[k, k, :], guard))
        col = A[k] * inv_d[None, :] * (rows >= k)
        cols.append(col)
        if k + 1 < n:
            A = A - col[:, None, :] * col[None, :, :]
    return jnp.stack(cols, axis=0)


def _chol_solve_t(Lt, Y, n):
    """Solve (L L^T) X = Y with Y (n, m, Bt), Lt from :func:`_chol_t`."""
    r3 = jax.lax.broadcasted_iota(jnp.int32, (n, 1, 1), 0)
    Z = Y
    for i in range(n):
        Lti = Lt[i]                                        # (n, Bt)
        zi = Z[i] / Lti[i][None, :]
        upd = Lti[:, None, :] * zi[None, :, :]
        Z = jnp.where(r3 == i, zi[None], Z - upd * (r3 > i))
    X = Z
    for i in reversed(range(n)):
        Lti = Lt[i]
        s = jnp.sum(Lti[:, None, :] * X * (r3 > i), axis=0)
        xi = (X[i] - s) / Lti[i][None, :]
        X = jnp.where(r3 == i, xi[None], X)
    return X


def _spd_kernel(a_ref, y_ref, x_ref, *, n, shift):
    r = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    eye = (r == c).astype(a_ref.dtype)[:, :, None]
    A = a_ref[:] + shift * eye
    Lt = _chol_t(A, n)
    x_ref[:] = _chol_solve_t(Lt, y_ref[:], n)


@partial(jax.jit, static_argnames=("interpret", "shift", "batch_tile",
                                   "vmem_limit_mb"))
def spd_solve(A, Y, shift: float = 0.0, interpret: bool = False,
              batch_tile: int = BATCH_TILE, vmem_limit_mb: int | None = None):
    """Solve A X = Y for a batch of SPD matrices.

    A: (B, n, n); Y: (B, n, m). Returns X (B, n, m). ``shift`` adds a
    diagonal Levenberg term before factorization. ``vmem_limit_mb`` raises
    the kernel's scoped-VMEM budget past the 16 MB default (the v5e has
    128 MB): the unrolled substitution temps exceed it for Gram systems
    k > ~52 even at RHS chunk 8 (the 42-var force-tracking WBC's k = 58
    null-projector solve measured 18.04 MB of kernel stack at batch 512).
    """
    B, n, _ = A.shape
    m = Y.shape[-1]
    if not interpret and jax.default_backend() != "tpu":
        interpret = True  # CPU fallback for tests of the hybrid solver path
    bt = min(batch_tile, B)
    if B % bt != 0:
        pad = bt - B % bt
        A = jnp.concatenate([A, jnp.tile(jnp.eye(n, dtype=A.dtype)[None], (pad, 1, 1))])
        Y = jnp.concatenate([Y, jnp.zeros((pad, n, m), dtype=Y.dtype)])
    Bp = A.shape[0]

    At = jnp.transpose(A, (1, 2, 0))  # (n, n, Bp)
    Yt = jnp.transpose(Y, (1, 2, 0))  # (n, m, Bp)

    grid = (Bp // bt,)
    out = pl.pallas_call(
        partial(_spd_kernel, n=n, shift=shift),
        out_shape=jax.ShapeDtypeStruct((n, m, Bp), A.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((n, n, bt), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, m, bt), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n, m, bt), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
        compiler_params=(None if vmem_limit_mb is None else
                         pltpu.CompilerParams(
                             vmem_limit_bytes=vmem_limit_mb * 1024 * 1024)),
        interpret=interpret,
    )(At, Yt)

    X = jnp.transpose(out, (2, 0, 1))[:B]
    return X


def spd_solve_ll(At, Yt, shift: float = 0.0, interpret: bool = False,
                 batch_tile: int = BATCH_TILE):
    """Lanes-last variant: At (n, n, B), Yt (n, m, B) -> X (n, m, B).

    Skips the transpose boundary for callers that already hold lanes-last
    data. B must be a multiple of ``batch_tile`` (or smaller than it).
    """
    n = At.shape[0]
    m = Yt.shape[1]
    B = At.shape[-1]
    bt = min(batch_tile, B)
    return pl.pallas_call(
        partial(_spd_kernel, n=n, shift=shift),
        out_shape=jax.ShapeDtypeStruct((n, m, B), At.dtype),
        grid=(B // bt,),
        in_specs=[
            pl.BlockSpec((n, n, bt), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, m, bt), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n, m, bt), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(At, Yt)


def spd_solve_reference(A, Y, shift: float = 0.0):
    """XLA reference implementation (vmapped cho_solve)."""

    def one(a, y):
        chol = jax.scipy.linalg.cho_factor(a + shift * jnp.eye(a.shape[0], dtype=a.dtype))
        return jax.scipy.linalg.cho_solve(chol, y)

    return jax.vmap(one)(A, Y)
