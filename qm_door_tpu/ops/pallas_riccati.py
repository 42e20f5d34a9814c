"""Pallas TPU kernel: the ENTIRE backward Riccati sweep in one kernel.

docs/PERF.md's round-4 roofline puts the batch-major `lax.scan` sweep at 15%
of speed-of-light — the only solver stage far from the bandwidth roof. Its
per-step work (a handful of (B,30,30) contractions + one SPD solve) is too
small to fill the chip, and XLA materializes the carry (S, s) plus every
intermediate to HBM between scan steps.

This kernel runs the whole sweep with the carry RESIDENT IN VMEM: the grid is
(batch_tiles, N) — the horizon iterated innermost, nodes streamed through
VMEM blocks in reverse order via the BlockSpec index map — and S/s live in
scratch that persists across grid steps of one batch tile. Per step it reads
the node's projected LQ data once from HBM and writes only (K, kff): the
HBM traffic is the information-theoretic minimum for the sweep.

All linear algebra is lanes-last ((p, q, Bt) with the batch on the 128-wide
lane axis), contractions unrolled at trace time (p, q <= 36 static), and the
gain solve reuses ops/pallas_chol's unrolled Cholesky. The reference cost
this replaces: HPIPM's Riccati backward pass (BASELINE.md kernel-efficiency
row demands the sweep at per-chip speed of light).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_chol import _chol_t, _chol_solve_t

BATCH_TILE = 128


# Mosaic lowering rule (the one pallas_chol lives by): integer indexing only
# on the LEADING axis — X[k] — never on inner axes (X[:, k] lowers to an
# unsupported gather on TPU). Every contraction below is therefore written
# k-major over its leading axis; products against the Riccati carry S use
# S's symmetry (row k == column k) to stay leading-indexed, and symmetry is
# maintained EXACTLY by construction (_mmT_sym) instead of a transposing
# post-hoc symmetrize.


def _mmT(X, Y, q):
    """X^T Y over the leading index: (q, p, Bt), (q, r, Bt) -> (p, r, Bt)."""
    acc = X[0][:, None, :] * Y[0][None, :, :]
    for k in range(1, q):
        acc = acc + X[k][:, None, :] * Y[k][None, :, :]
    return acc


def _mmT_sym(X, Y, q):
    """0.5 (X^T Y + Y^T X): (q, p, Bt) x (q, p, Bt) -> (p, p, Bt).

    Exactly fp-symmetric: entries (i, j) and (j, i) are the same sum of
    commuted products accumulated in the same k order."""
    acc = 0.5 * (X[0][:, None, :] * Y[0][None, :, :]
                 + Y[0][:, None, :] * X[0][None, :, :])
    for k in range(1, q):
        acc = acc + 0.5 * (X[k][:, None, :] * Y[k][None, :, :]
                           + Y[k][:, None, :] * X[k][None, :, :])
    return acc


def _mvT(X, v, q):
    """X^T v over the leading index: (q, p, Bt), (q, Bt) -> (p, Bt)."""
    acc = X[0] * v[0][None, :]
    for k in range(1, q):
        acc = acc + X[k] * v[k][None, :]
    return acc


def _sym_mm(S, A, n):
    """S A for SYMMETRIC S (n, n, Bt), A (n, r, Bt) -> (n, r, Bt).

    (S A)[i, j] = sum_k S[k][i] A[k][j] by symmetry -> leading-only reads."""
    acc = S[0][:, None, :] * A[0][None, :, :]
    for k in range(1, n):
        acc = acc + S[k][:, None, :] * A[k][None, :, :]
    return acc


def _ric_bwd_kernel(A_ref, B_ref, d_ref, lx_ref, lu_ref, lxx_ref, luu_ref,
                    lux_ref, lxxf_ref, lxf_ref, K_ref, kff_ref, S_scr, s_scr,
                    *, nx, nu, shift):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        S_scr[:] = lxxf_ref[:]
        s_scr[:] = lxf_ref[:]

    S = S_scr[:]
    s = s_scr[:]
    A = A_ref[0]
    Bm = B_ref[0]
    d = d_ref[0]
    lx = lx_ref[0]
    lu = lu_ref[0]
    lxx = lxx_ref[0]
    luu = luu_ref[0]
    lux = lux_ref[0]

    # S is kept exactly symmetric (see _mmT_sym), so S d reads rows
    Sd_s = _mvT(S, d, nx) + s                      # (nx, Bt)
    Qx = lx + _mvT(A, Sd_s, nx)
    Qu = lu + _mvT(Bm, Sd_s, nx)
    SA = _sym_mm(S, A, nx)                         # (nx, nx, Bt)
    SB = _sym_mm(S, Bm, nx)                        # (nx, nu, Bt)
    Qxx = lxx + _mmT_sym(A, SA, nx)
    Quu = luu + _mmT_sym(Bm, SB, nx)               # (nu, nu, Bt)
    Qux = lux + _mmT(Bm, SA, nx)                   # (nu, nx, Bt)

    rows = jax.lax.broadcasted_iota(jnp.int32, (nu, nu), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (nu, nu), 1)
    eye = (rows == cols).astype(Quu.dtype)[:, :, None]
    Lt = _chol_t(Quu + shift * eye, nu)
    K = -_chol_solve_t(Lt, Qux, nu)                # (nu, nx, Bt)
    kff2 = -_chol_solve_t(Lt, Qu[:, None, :], nu)  # (nu, 1, Bt)
    kff = jnp.sum(kff2, axis=1)                    # singleton squeeze sans gather
    K_ref[0] = K
    kff_ref[0] = kff

    S_scr[:] = Qxx + _mmT_sym(Qux, K, nu)
    s_scr[:] = Qx + _mvT(Qux, kff, nu)


@partial(jax.jit, static_argnames=("interpret", "batch_tile", "shift"))
def riccati_backward_fused(A, B, d, lx, lu, lxx, luu, lux, lxx_f, lx_f,
                           shift: float = 0.0, interpret: bool = False,
                           batch_tile: int = BATCH_TILE):
    """Full backward Riccati sweep in one kernel.

    Batch-major inputs: A (Bb, N, nx, nx), B (Bb, N, nx, nu), d/lx (Bb, N, nx),
    lu (Bb, N, nu), lxx (Bb, N, nx, nx), luu (Bb, N, nu, nu),
    lux (Bb, N, nu, nx), lxx_f (Bb, nx, nx), lx_f (Bb, nx).
    Returns (K (Bb, N, nu, nx), kff (Bb, N, nu)).
    """
    Bb, N, nx, nu = B.shape
    dtype = A.dtype
    if not interpret and jax.default_backend() != "tpu":
        interpret = True  # CPU fallback (tests)
    # the kernel reads S (and the Cholesky pivot) by ROWS, relying on exact
    # symmetry; make the Hessian inputs exactly symmetric up front (cheap in
    # XLA, impossible in-kernel without a sublane transpose)
    sym = lambda M: 0.5 * (M + jnp.swapaxes(M, -1, -2))
    lxx, luu, lxx_f = sym(lxx), sym(luu), sym(lxx_f)
    bt = min(batch_tile, Bb)
    if Bb % bt != 0:
        pad = bt - Bb % bt

        def padb(x, diag=None):
            pshape = (pad,) + x.shape[1:]
            if diag is not None:
                p = jnp.broadcast_to(jnp.eye(diag, dtype=dtype), pshape)
            else:
                p = jnp.zeros(pshape, dtype=dtype)
            return jnp.concatenate([x, p])

        # padded problems: S stays I, Quu = I (luu=I) -> solvable, discarded
        A, B, d, lx, lu, lux = (padb(x) for x in (A, B, d, lx, lu, lux))
        lxx, luu = padb(lxx, nx), padb(luu, nu)
        lxx_f, lx_f = padb(lxx_f, nx), padb(lx_f)
    Bp = A.shape[0]

    # lanes-last: (N, p, q, B) for per-node data, (p, q, B) for terminal
    tol = lambda x: jnp.transpose(x, (1, 2, 3, 0))
    tov = lambda x: jnp.transpose(x, (1, 2, 0))
    At, Bt_, lxxt, luut, luxt = (tol(x) for x in (A, B, lxx, luu, lux))
    dt_, lxt, lut = (tov(x) for x in (d, lx, lu))
    lxxf_t = jnp.transpose(lxx_f, (1, 2, 0))
    lxf_t = jnp.transpose(lx_f, (1, 0))

    grid = (Bp // bt, N)
    node = lambda i, j: (N - 1 - j, 0, 0, i)
    nodev = lambda i, j: (N - 1 - j, 0, i)
    fixed = lambda i, j: (0, 0, i)
    fixedv = lambda i, j: (0, i)

    K_t, kff_t = pl.pallas_call(
        partial(_ric_bwd_kernel, nx=nx, nu=nu, shift=shift),
        out_shape=(
            jax.ShapeDtypeStruct((N, nu, nx, Bp), dtype),
            jax.ShapeDtypeStruct((N, nu, Bp), dtype),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, nx, nx, bt), node, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nx, nu, bt), node, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nx, bt), nodev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nx, bt), nodev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nu, bt), nodev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nx, nx, bt), node, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nu, nu, bt), node, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nu, nx, bt), node, memory_space=pltpu.VMEM),
            pl.BlockSpec((nx, nx, bt), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((nx, bt), fixedv, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, nu, nx, bt), node, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nu, bt), nodev, memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((nx, nx, bt), dtype),
            pltpu.VMEM((nx, bt), dtype),
        ],
        # The default 16 MB scoped-VMEM budget is 1.02 MB short for this
        # kernel at bt=128 (production shapes: 8 node blocks double-buffered
        # + carry scratch + the unrolled contraction/Cholesky live temps);
        # the v5e has 128 MB of VMEM, so raise the kernel's budget instead
        # of halving the batch tile (a 64-lane tile pads back to 128 lanes
        # and wastes half the bandwidth).
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(At, Bt_, dt_, lxt, lut, lxxt, luut, luxt, lxxf_t, lxf_t)

    K = jnp.transpose(K_t, (3, 0, 1, 2))[:Bb]
    kff = jnp.transpose(kff_t, (2, 0, 1))[:Bb]
    return K, kff


def riccati_backward_fused_lq(lq, shift: float = 0.0, interpret: bool = False):
    """ProjectedLq adapter for :func:`riccati_backward_fused`."""
    Bb = lq.A.shape[0]
    lxx_f = jnp.broadcast_to(lq.lxx_f, (Bb,) + lq.lxx_f.shape[-2:]) \
        if lq.lxx_f.ndim == 2 else lq.lxx_f
    lx_f = jnp.broadcast_to(lq.lx_f, (Bb,) + lq.lx_f.shape[-1:]) \
        if lq.lx_f.ndim == 1 else lq.lx_f
    return riccati_backward_fused(
        lq.A, lq.B, lq.d, lq.lx, lq.lu, lq.lxx, lq.luu, lq.lux,
        lxx_f, lx_f, shift=shift, interpret=interpret)
