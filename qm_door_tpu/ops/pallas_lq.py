"""Lanes-last Pallas TPU kernels for the LQ stage of the SQP solver.

STATUS: correct but SLOW — measured 16.0 ms/solve vs 0.57 ms/solve for the
XLA path at batch 256 / 67 nodes on a v5e (tools/profile_pallas_lq.py,
round 2). The unrolled 30-dim small-matrix algebra expands to thousands of
vector ops per grid step with heavy register spilling, while XLA's batched
cho_solve/matmul primitives at these shapes are already overhead-bound
(~20-30 us per batched call, tools/microbench_lq.py). Kept as a tested
experiment (backend="pallas") and as the template for future Mosaic
toolchains; the production path is solver/batched_sqp.py backend="xla".

The reference's QP stage (HPIPM Riccati over ~67 nodes, see SURVEY.md §3.2
and /root/reference/qm_controllers/config/task.info:75-93) maps here to
three fused kernels operating on a *lanes-last* batch layout: every per-node
matrix lives as ``(rows, cols, B)`` with the scenario batch on the 128-lane
axis, so each scalar operation of the small-matrix algebra (12/18/30 dims) is
a full-width VPU vector op.

Performance rules baked into every helper (violating them measured 24x
slower than XLA):

- contractions run over the OUTER dim only: ``A[i]`` is a contiguous slice;
  ``A[:, i, :]`` is a per-sublane extract that Mosaic lowers catastrophically.
  Operands that would need column access are fed pre-transposed (B_T, Gv_T)
  or are symmetric (S, P, lxx, luu, M) so rows substitute for columns.
- mat-vecs are broadcast+reduce (``(A * x).sum(axis)``), never per-column FMA.
- no ``.at[].set/add`` and no int+newaxis indexing — both lower to >2D
  scatter/gather, which Mosaic rejects.

Kernels (grid = (batch_tiles, N), sequential on-core; carries live in VMEM
scratch across grid steps):

1. ``project_lq``        — node-parallel: Cholesky-projector equality
   projection (solver/projection.py math) fused with the cost/dynamics
   substitution (solver/transcription.py:project_ocp).
2. ``riccati_backward_ll`` — reverse scan: classic Riccati sweep with a fused,
   fully unrolled 30x30 Cholesky gain solve per node.
3. ``riccati_forward_ll``  — forward scan: LQ rollout + full-input recovery
   du = p + Pu u_red + Px dx.

All math matches solver/{projection,transcription,riccati}.py up to f32
reassociation; tests/test_pallas_lq.py checks equivalence in interpreter mode
on CPU (f64) and tools/profile_pallas_lq.py on the TPU (f32).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NX = 30
NU = 30  # reduced input dim of the Cholesky projector (12 forces + 18 joints)
NV = 18
NC = 12

BATCH_TILE = 128


# ---------------------------------------------------------------------------
# lanes-last small-matrix algebra (values, not refs): batch is the last axis.
# ---------------------------------------------------------------------------

def _mtm(A, B):
    """A^T @ B contracting the OUTER dim: (k, a, Bt), (k, c, Bt) -> (a, c, Bt)."""
    k = A.shape[0]
    acc = A[0][:, None, :] * B[0][None, :, :]
    for i in range(1, k):
        acc = acc + A[i][:, None, :] * B[i][None, :, :]
    return acc


def _mv(A, x):
    """A @ x: (a, k, Bt), (k, Bt) -> (a, Bt) via broadcast + sublane reduce."""
    return jnp.sum(A * x[None, :, :], axis=1)


def _mtv(A, x):
    """A^T @ x: (k, a, Bt), (k, Bt) -> (a, Bt) via broadcast + outer reduce."""
    return jnp.sum(A * x[:, None, :], axis=0)


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
    """Solve (L L^T) X = Y with Y (n, m, Bt), Lt from :func:`_chol_t`.

    Forward pass is right-looking (uses column Lt[i]); backward pass is
    left-looking (row i of L^T is also Lt[i]) — no sublane extracts."""
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
        # sum_{j>i} L^T[i, j] X[j] with L^T[i, j] = Lt[i][j]
        s = jnp.sum(Lti[:, None, :] * X * (r3 > i), axis=0)
        xi = (X[i] - s) / Lti[i][None, :]
        X = jnp.where(r3 == i, xi[None], X)
    return X


def _eye_ll(n, dtype):
    r = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    return (r == c).astype(dtype)[:, :, None]


# ---------------------------------------------------------------------------
# Kernel 1: projection + substitution (node-parallel)
# ---------------------------------------------------------------------------

def _project_geom_kernel(a_ref, b_ref, bT_ref, d_ref, g0_ref, gx_ref, gv_ref,
                         gvT_ref, fbar_ref, act_ref, fm_ref,
                         abar_ref, bbar_ref, dbar_ref, p_ref, P_ref, pxv_ref):
    """Cholesky-projector geometry + dynamics substitution (one node)."""
    dtype = a_ref.dtype
    A = a_ref[0]
    B = b_ref[0]              # (30, 30, Bt) rows = x-dim
    BT = bT_ref[0]            # (30, 30, Bt) rows = u-dim (B transposed)
    Gv = gv_ref[0]            # (12, 18, Bt)
    GvT = gvT_ref[0]          # (18, 12, Bt)
    Gx = gx_ref[0]            # (12, 30, Bt)
    g0 = g0_ref[0]            # (12, Bt)
    act = act_ref[0]          # (12, Bt)
    fm = fm_ref[0]            # (12, Bt)
    F_bar = fbar_ref[0]       # (12, Bt)

    # M = Gv Gv^T + diag(1 - act)  — symmetric (12, 12, Bt)
    M = _mtm(GvT, GvT) + _eye_ll(NC, dtype) * (1.0 - act)[:, None, :]
    Lt = _chol_t(M, NC)

    # One solve, stacked RHS: W = M^-1 [g0 | Gx | Gv]   (12, 49, Bt)
    rhs = jnp.concatenate([g0[:, None, :], Gx, Gv], axis=1)
    W = _chol_solve_t(Lt, rhs, NC)
    # Gv^+ y = Gv^T M^-1 y: contract over the 12 constraint rows (outer dim)
    du_part = -_mtv(Gv, W[:, 0, :])                     # (18, Bt)
    Px_v = -_mtm(Gv, W[:, 1:1 + NX, :])                 # (18, 30, Bt)
    P = _eye_ll(NV, dtype) - _mtm(Gv, W[:, 1 + NX:, :])  # (18, 18, Bt) sym

    p = jnp.concatenate([-(1.0 - fm) * F_bar, du_part], axis=0)  # (30, Bt)

    BTV = BT[NC:]                                       # (18, 30, Bt) = BV^T
    abar_ref[0] = A + _mtm(BTV, Px_v)
    bbar_ref[0] = jnp.concatenate(
        [B[:, :NC, :] * fm[None, :, :], _mtm(BTV, P)], axis=1)
    dbar_ref[0] = d_ref[0] + _mtv(BT, p)
    p_ref[0] = p
    P_ref[0] = P
    pxv_ref[0] = Px_v


def _project_cost_kernel(lx_ref, lu_ref, lxx_ref, luu_ref, lux_ref, p_ref,
                         P_ref, pxv_ref, fm_ref,
                         lxb_ref, lub_ref, lxxb_ref, luub_ref, luxb_ref,
                         *, shift):
    """Cost substitution du = p + Pu u_red + Px dx into the quadratic model
    (one node). Split from the geometry kernel to fit the VMEM budget."""
    dtype = lxx_ref.dtype
    p = p_ref[0]
    P = P_ref[0]              # (18, 18, Bt) symmetric projector
    Px_v = pxv_ref[0]         # (18, 30, Bt)
    fm = fm_ref[0]            # (12, Bt)
    lxx = lxx_ref[0]          # symmetric
    luu = luu_ref[0]          # symmetric
    lux = lux_ref[0]          # rows = u-dim

    lu_p = lu_ref[0] + _mtv(luu, p)                     # (30, Bt) (luu sym)
    lxb_ref[0] = lx_ref[0] + _mtv(Px_v, lu_p[NC:]) + _mtv(lux, p)
    lub_ref[0] = jnp.concatenate(
        [fm * lu_p[:NC], _mtv(P, lu_p[NC:])], axis=0)

    PxT_lux = _mtm(Px_v, lux[NC:])                      # Px^T lux (30, 30, Bt)
    luxT_Px = _mtm(lux[NC:], Px_v)                      # its transpose
    luuVV = luu[NC:, NC:, :]                            # symmetric
    lxxb_ref[0] = lxx + PxT_lux + luxT_Px + _mtm(Px_v, _mtm(luuVV, Px_v))

    # Pu^T luu Pu + reg, exploiting luu symmetry: luuFV @ P = (luuVF)^T P
    luuVF = luu[NC:, :NC, :]                            # (18, 12, Bt)
    luuFV_P = _mtm(luuVF, P)                            # (12, 18, Bt)
    top = jnp.concatenate(
        [luu[:NC, :NC, :] * fm[:, None, :] * fm[None, :, :] +
         _eye_ll(NC, dtype) * ((1.0 - fm)[:, None, :] + shift),
         luuFV_P * fm[:, None, :]], axis=1)
    P_luuVF = _mtm(P, luuVF)                            # (18, 12, Bt) (P sym)
    PVVT = _mtm(luuVV, P)                               # (P luuVV)^T
    bot = jnp.concatenate(
        [P_luuVF * fm[None, :, :],
         _mtm(PVVT, P) + (_eye_ll(NV, dtype) * (1.0 + shift) - P)], axis=1)
    luub_ref[0] = jnp.concatenate([top, bot], axis=0)

    # luu @ Px = luu[:, 12:] @ Px_v = (luu[12:, :])^T Px_v   (luu sym)
    luu_Px = _mtm(luu[NC:], Px_v)                       # (30, 30, Bt)
    term = lux + luu_Px
    luxb_ref[0] = jnp.concatenate(
        [term[:NC] * fm[:, None, :], _mtm(P, term[NC:])], axis=0)


# ---------------------------------------------------------------------------
# Kernel 2: Riccati backward sweep (reverse scan over nodes)
# ---------------------------------------------------------------------------

def _backward_kernel(a_ref, b_ref, d_ref, lx_ref, lu_ref, lxx_ref, luu_ref,
                     lux_ref, lxxf_ref, lxf_ref, k_ref, kff_ref,
                     S_scr, s_scr):
    first = pl.program_id(1) == 0

    @pl.when(first)
    def _():
        S_scr[:] = lxxf_ref[:]
        s_scr[:] = lxf_ref[:]

    A = a_ref[0]
    B = b_ref[0]
    d = d_ref[0]
    S = S_scr[:]               # symmetric by construction
    s = s_scr[:]

    Sd_s = _mtv(S, d) + s
    Qx = lx_ref[0] + _mtv(A, Sd_s)
    Qu = lu_ref[0] + _mtv(B, Sd_s)
    SA = _mtm(S, A)            # S @ A (S sym)
    SB = _mtm(S, B)
    Qxx = lxx_ref[0] + _mtm(A, SA)
    Quu = luu_ref[0] + _mtm(B, SB)
    Qux = lux_ref[0] + _mtm(B, SA)

    Lt = _chol_t(Quu, NU)
    rhs = jnp.concatenate([Qux, Qu[:, None, :]], axis=1)   # (30, 31, Bt)
    sol = _chol_solve_t(Lt, rhs, NU)
    K = -sol[:, :NX, :]
    kff = -sol[:, NX, :]

    QK = _mtm(Qux, K)
    S_new = Qxx + 0.5 * (QK + _mtm(K, Qux))
    s_new = Qx + _mtv(Qux, kff)

    S_scr[:] = S_new
    s_scr[:] = s_new
    k_ref[0] = K
    kff_ref[0] = kff


# ---------------------------------------------------------------------------
# Kernel 3: forward rollout + input recovery
# ---------------------------------------------------------------------------

def _forward_kernel(a_ref, b_ref, d_ref, k_ref, kff_ref, p_ref, P_ref,
                    pxv_ref, fm_ref, dx0_ref, dx_out_ref, dxN_ref, du_ref,
                    dx_scr):
    n_nodes = pl.num_programs(1)
    k_id = pl.program_id(1)

    @pl.when(k_id == 0)
    def _():
        dx_scr[:] = dx0_ref[:]

    dx = dx_scr[:]                     # (30, Bt)
    u_red = kff_ref[0] + _mv(k_ref[0], dx)
    p = p_ref[0]
    fm = fm_ref[0]
    du_F = p[:NC] + fm * u_red[:NC]
    # Px_v (18, 30, Bt): Px_v @ dx sums over the x (sublane) dim;
    # P (18, 18, Bt) symmetric.
    du_V = p[NC:] + _mv(P_ref[0], u_red[NC:]) + _mv(pxv_ref[0], dx)
    du = jnp.concatenate([du_F, du_V], axis=0)

    dx_next = _mv(a_ref[0], dx) + _mv(b_ref[0], u_red) + d_ref[0]

    dx_out_ref[0] = dx
    du_ref[0] = du
    dx_scr[:] = dx_next

    @pl.when(k_id == n_nodes - 1)
    def _():
        dxN_ref[:] = dx_next


# ---------------------------------------------------------------------------
# Host wrappers
# ---------------------------------------------------------------------------

def _pad_batch(arrs, B, bt):
    if B % bt == 0:
        return arrs, B
    pad = bt - B % bt
    out = []
    for a in arrs:
        pw = [(0, 0)] * (a.ndim - 1) + [(0, pad)]
        out.append(jnp.pad(a, pw, mode="edge"))
    return out, B + pad


def _mat_spec(shape, bt):
    """BlockSpec for (N, r, c, B) node arrays: one node, one batch tile."""
    r, c = shape
    return pl.BlockSpec((1, r, c, bt), lambda bi, k: (k, 0, 0, bi),
                        memory_space=pltpu.VMEM)


def _vec_spec(r, bt):
    return pl.BlockSpec((1, r, bt), lambda bi, k: (k, 0, bi),
                        memory_space=pltpu.VMEM)


def _mat_spec_rev(shape, bt, N):
    r, c = shape
    return pl.BlockSpec((1, r, c, bt), lambda bi, k: (N - 1 - k, 0, 0, bi),
                        memory_space=pltpu.VMEM)


def _vec_spec_rev(r, bt, N):
    return pl.BlockSpec((1, r, bt), lambda bi, k: (N - 1 - k, 0, bi),
                        memory_space=pltpu.VMEM)


def _const_mat_spec(shape, bt):
    r, c = shape
    return pl.BlockSpec((r, c, bt), lambda bi, k: (0, 0, bi),
                        memory_space=pltpu.VMEM)


def _const_vec_spec(r, bt):
    return pl.BlockSpec((r, bt), lambda bi, k: (0, bi),
                        memory_space=pltpu.VMEM)


@partial(jax.jit, static_argnames=("shift", "interpret", "batch_tile"))
def project_lq(A, B, BT, d, lx, lu, lxx, luu, lux, g0, Gx, Gv, GvT, F_bar,
               act, fm, shift: float = 1e-5, interpret: bool = False,
               batch_tile: int = BATCH_TILE):
    """Lanes-last fused projection + substitution.

    All inputs (N, r, c, B) / (N, r, B); BT and GvT are the transposes of
    B and Gv (fed separately so the kernel only ever contracts over outer
    dims). Returns the projected LQ pieces
    (A_bar, B_bar, d_bar, lx, lu, lxx, luu, lux, p, P, Px_v), lanes-last.
    """
    N, _, _, Bfull = A.shape
    bt = min(batch_tile, Bfull)
    arrs = [A, B, BT, d, lx, lu, lxx, luu, lux, g0, Gx, Gv, GvT, F_bar, act, fm]
    arrs, Bp = _pad_batch(arrs, Bfull, bt)
    A, B, BT, d, lx, lu, lxx, luu, lux, g0, Gx, Gv, GvT, F_bar, act, fm = arrs
    nb = Bp // bt
    dtype = A.dtype

    grid = (nb, N)

    # Pass 1: projector geometry + dynamics substitution (within VMEM budget;
    # the fused single-kernel variant needed 20.3 MB > 16 MB at tile 128).
    geom_out_shapes = [
        jax.ShapeDtypeStruct((N, NX, NX, Bp), dtype),   # A_bar
        jax.ShapeDtypeStruct((N, NX, NU, Bp), dtype),   # B_bar
        jax.ShapeDtypeStruct((N, NX, Bp), dtype),       # d_bar
        jax.ShapeDtypeStruct((N, NU, Bp), dtype),       # p
        jax.ShapeDtypeStruct((N, NV, NV, Bp), dtype),   # P
        jax.ShapeDtypeStruct((N, NV, NX, Bp), dtype),   # Px_v
    ]
    geom_in_specs = [
        _mat_spec((NX, NX), bt), _mat_spec((NX, NU), bt),
        _mat_spec((NU, NX), bt), _vec_spec(NX, bt),
        _vec_spec(NC, bt), _mat_spec((NC, NX), bt), _mat_spec((NC, NV), bt),
        _mat_spec((NV, NC), bt),
        _vec_spec(NC, bt), _vec_spec(NC, bt), _vec_spec(NC, bt),
    ]
    geom_out_specs = [
        _mat_spec((NX, NX), bt), _mat_spec((NX, NU), bt), _vec_spec(NX, bt),
        _vec_spec(NU, bt), _mat_spec((NV, NV), bt), _mat_spec((NV, NX), bt),
    ]
    A_bar, B_bar, d_bar, p, P, Px_v = pl.pallas_call(
        _project_geom_kernel,
        out_shape=geom_out_shapes,
        grid=grid,
        in_specs=geom_in_specs,
        out_specs=geom_out_specs,
        interpret=interpret,
    )(A, B, BT, d, g0, Gx, Gv, GvT, F_bar, act, fm)

    # Pass 2: cost substitution using the projector pieces from pass 1.
    cost_out_shapes = [
        jax.ShapeDtypeStruct((N, NX, Bp), dtype),       # lx
        jax.ShapeDtypeStruct((N, NU, Bp), dtype),       # lu
        jax.ShapeDtypeStruct((N, NX, NX, Bp), dtype),   # lxx
        jax.ShapeDtypeStruct((N, NU, NU, Bp), dtype),   # luu
        jax.ShapeDtypeStruct((N, NU, NX, Bp), dtype),   # lux
    ]
    cost_in_specs = [
        _vec_spec(NX, bt), _vec_spec(NU, bt),
        _mat_spec((NX, NX), bt), _mat_spec((NU, NU), bt), _mat_spec((NU, NX), bt),
        _vec_spec(NU, bt), _mat_spec((NV, NV), bt), _mat_spec((NV, NX), bt),
        _vec_spec(NC, bt),
    ]
    cost_out_specs = [
        _vec_spec(NX, bt), _vec_spec(NU, bt),
        _mat_spec((NX, NX), bt), _mat_spec((NU, NU), bt), _mat_spec((NU, NX), bt),
    ]
    lxb, lub, lxxb, luub, luxb = pl.pallas_call(
        partial(_project_cost_kernel, shift=shift),
        out_shape=cost_out_shapes,
        grid=grid,
        in_specs=cost_in_specs,
        out_specs=cost_out_specs,
        interpret=interpret,
    )(lx, lu, lxx, luu, lux, p, P, Px_v, fm)

    outs = (A_bar, B_bar, d_bar, lxb, lub, lxxb, luub, luxb, p, P, Px_v)
    return tuple(o[..., :Bfull] for o in outs)


@partial(jax.jit, static_argnames=("interpret", "batch_tile"))
def riccati_backward_ll(A, B, d, lx, lu, lxx, luu, lux, lxx_f, lx_f,
                        interpret: bool = False, batch_tile: int = BATCH_TILE):
    """Lanes-last Riccati backward sweep. Returns (K, kff) lanes-last."""
    N, _, _, Bfull = A.shape
    bt = min(batch_tile, Bfull)
    arrs = [A, B, d, lx, lu, lxx, luu, lux, lxx_f, lx_f]
    arrs, Bp = _pad_batch(arrs, Bfull, bt)
    A, B, d, lx, lu, lxx, luu, lux, lxx_f, lx_f = arrs
    nb = Bp // bt
    dtype = A.dtype

    grid = (nb, N)
    outs = pl.pallas_call(
        _backward_kernel,
        out_shape=[
            jax.ShapeDtypeStruct((N, NU, NX, Bp), dtype),
            jax.ShapeDtypeStruct((N, NU, Bp), dtype),
        ],
        grid=grid,
        in_specs=[
            _mat_spec_rev((NX, NX), bt, N), _mat_spec_rev((NX, NU), bt, N),
            _vec_spec_rev(NX, bt, N), _vec_spec_rev(NX, bt, N),
            _vec_spec_rev(NU, bt, N),
            _mat_spec_rev((NX, NX), bt, N), _mat_spec_rev((NU, NU), bt, N),
            _mat_spec_rev((NU, NX), bt, N),
            _const_mat_spec((NX, NX), bt), _const_vec_spec(NX, bt),
        ],
        out_specs=[
            _mat_spec_rev((NU, NX), bt, N), _vec_spec_rev(NU, bt, N),
        ],
        scratch_shapes=[
            pltpu.VMEM((NX, NX, bt), dtype),
            pltpu.VMEM((NX, bt), dtype),
        ],
        interpret=interpret,
    )(A, B, d, lx, lu, lxx, luu, lux, lxx_f, lx_f)
    K, kff = outs
    return K[..., :Bfull], kff[..., :Bfull]


@partial(jax.jit, static_argnames=("interpret", "batch_tile"))
def riccati_forward_ll(A, B, d, K, kff, p, P, Px_v, fm, dx0,
                       interpret: bool = False, batch_tile: int = BATCH_TILE):
    """Lanes-last LQ forward rollout.

    fm: (N, 12, B) stance force mask. dx0: (30, B).
    Returns (dX (N+1, 30, B), dU (N, 30, B))."""
    N, _, _, Bfull = A.shape
    bt = min(batch_tile, Bfull)
    arrs = [A, B, d, K, kff, p, P, Px_v, fm, dx0]
    arrs, Bp = _pad_batch(arrs, Bfull, bt)
    A, B, d, K, kff, p, P, Px_v, fm, dx0 = arrs
    nb = Bp // bt
    dtype = A.dtype

    grid = (nb, N)
    dX, dxN, dU = pl.pallas_call(
        _forward_kernel,
        out_shape=[
            jax.ShapeDtypeStruct((N, NX, Bp), dtype),
            jax.ShapeDtypeStruct((NX, Bp), dtype),
            jax.ShapeDtypeStruct((N, NU, Bp), dtype),
        ],
        grid=grid,
        in_specs=[
            _mat_spec((NX, NX), bt), _mat_spec((NX, NU), bt), _vec_spec(NX, bt),
            _mat_spec((NU, NX), bt), _vec_spec(NU, bt), _vec_spec(NU, bt),
            _mat_spec((NV, NV), bt), _mat_spec((NV, NX), bt),
            _vec_spec(NC, bt), _const_vec_spec(NX, bt),
        ],
        out_specs=[
            _vec_spec(NX, bt), _const_vec_spec(NX, bt), _vec_spec(NU, bt),
        ],
        scratch_shapes=[pltpu.VMEM((NX, bt), dtype)],
        interpret=interpret,
    )(A, B, d, K, kff, p, P, Px_v, fm, dx0)
    dX = jnp.concatenate([dX, dxN[None]], axis=0)
    return dX[..., :Bfull], dU[..., :Bfull]


# ---------------------------------------------------------------------------
# End-to-end: batched LQ solve (transpose boundary + three kernels)
# ---------------------------------------------------------------------------

def solve_lq_batched(lq_batched, act, fm, F_bar, dx0, shift: float = 1e-5,
                     interpret: bool = False, batch_tile: int = BATCH_TILE):
    """Full projected-LQ solve for a batch of scenarios.

    lq_batched: LqProblem with leading (B, N, ...) axes (vmapped linearize
    output). act/fm: (B, N, 12) row/force masks; F_bar (B, N, 12); dx0 (B, 30).
    Returns (dX (B, N+1, 30), dU (B, N, 30)) batch-major.
    """
    def t4(x):  # (B, N, r, c) -> (N, r, c, B)
        return jnp.transpose(x, (1, 2, 3, 0))

    def t4T(x):  # (B, N, r, c) -> (N, c, r, B)  (transposed operand)
        return jnp.transpose(x, (1, 3, 2, 0))

    def t3(x):  # (B, N, r) -> (N, r, B)
        return jnp.transpose(x, (1, 2, 0))

    A, B_, d = t4(lq_batched.A), t4(lq_batched.B), t3(lq_batched.d)
    lx, lu = t3(lq_batched.lx), t3(lq_batched.lu)
    lxx, luu, lux = t4(lq_batched.lxx), t4(lq_batched.luu), t4(lq_batched.lux)
    g0, Gx, Gv = t3(lq_batched.g0), t4(lq_batched.Gx), t4(lq_batched.Gv)
    BT, GvT = t4T(lq_batched.B), t4T(lq_batched.Gv)
    lxx_f = jnp.transpose(lq_batched.lxx_f, (1, 2, 0))
    lx_f = jnp.transpose(lq_batched.lx_f, (1, 0))

    actT, fmT, FbT = t3(act), t3(fm), t3(F_bar)

    pr = project_lq(A, B_, BT, d, lx, lu, lxx, luu, lux, g0, Gx, Gv, GvT,
                    FbT, actT, fmT, shift=shift, interpret=interpret,
                    batch_tile=batch_tile)
    A_bar, B_bar, d_bar, lxb, lub, lxxb, luub, luxb, p, P, Px_v = pr

    K, kff = riccati_backward_ll(A_bar, B_bar, d_bar, lxb, lub, lxxb, luub,
                                 luxb, lxx_f, lx_f, interpret=interpret,
                                 batch_tile=batch_tile)
    dX, dU = riccati_forward_ll(A_bar, B_bar, d_bar, K, kff, p, P, Px_v, fmT,
                                jnp.transpose(dx0, (1, 0)),
                                interpret=interpret, batch_tile=batch_tile)
    return jnp.transpose(dX, (2, 0, 1)), jnp.transpose(dU, (2, 0, 1))
