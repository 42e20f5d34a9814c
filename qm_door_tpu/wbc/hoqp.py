"""Hierarchical QP cascade (HoQp replacement, Bellicoso et al. 2016).

Mirrors qm_wbc/src/HoQp.cpp semantics with TPU-friendly fixed shapes:

- each priority level solves
    min_{z,v} ||A_l (x_prev + Z z) - b_l||^2 + ||v||^2
    s.t. D_i (x_prev + Z z) <= f_i + v_i*   (all higher levels i)
         D_l (x_prev + Z z) <= f_l + v,  v >= 0
- the next level's null-space basis Z <- Z @ null(A_l Z) is computed with a
  singular-value-thresholded SVD instead of fullPivLu().kernel(): masked task
  rows and already-masked basis columns are exactly zero, so thresholding
  recovers the same subspace with static shapes (the solution is invariant to
  the choice of null-space basis).
- padded/massked basis columns get unit diagonal regularization in H, pinning
  their coordinates to zero without affecting live coordinates.
"""
from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

from .qp import solve_qp, solve_qp_batched, solve_qp_slack_batched


class Task(NamedTuple):
    """Equality (A x = b) and inequality (D x <= f) rows; masked rows are zero
    with f = +margin so they never activate."""

    A: jnp.ndarray
    b: jnp.ndarray
    D: jnp.ndarray
    f: jnp.ndarray


def null_space_masked(M, rel_tol=None):
    """Full-width (n x n) null-space basis of M (m x n) with column mask.

    Columns of the returned Z span null(M); columns corresponding to the row
    space are exactly zero (masked), keeping shapes static.
    """
    if rel_tol is None:
        rel_tol = 1e-5 if M.dtype == jnp.float32 else 1e-9
    u, s, vt = jnp.linalg.svd(M, full_matrices=True)
    n = M.shape[1]
    k = s.shape[0]
    tol = rel_tol * jnp.maximum(jnp.max(s), 1.0)
    live = jnp.concatenate([s > tol, jnp.zeros(n - k, dtype=bool)])  # row-space cols
    mask = 1.0 - live.astype(M.dtype)
    return vt.T * mask[None, :]


def null_projector(A, ridge=None):
    """Orthogonal projector onto null(A) via a masked SPD Cholesky solve —
    no SVD/QR (both compile and run poorly on TPU). Rows of A that are
    identically zero (masked tasks) are handled exactly by the diagonal
    completion; genuine rank deficiency across stacked rows is absorbed by a
    relative ridge.

    null(A) is invariant to row scaling, so rows are equilibrated to unit
    norm before forming the Gram matrix: WBC stacks mix EoM rows (norm ~28)
    with unit Jacobian rows and 100x-weighted swing rows, driving cond(AA')
    to ~1e7+ — at f32 that costs the projector ~1e-2 leakage, which surfaced
    as a 0.23 N floating-base EoM violation after the level-2 solve (ADVICE
    round 2). Equilibration plus one iterative-refinement pass brings
    ||A @ P|| to ~2e-5 at f32.

    The ridge is tiered: projector leakage scales linearly with it, so the
    thin 1e-7 default is preferred, but the f32-computed Gram carries
    ~m*eps ~ 6e-6 rounding and highly redundant stacks (flight phase: all
    zero-force + swing rows duplicate directions) can go indefinite -> NaN
    Cholesky. On non-finite result the projector is recomputed with the
    safe 1e-5 ridge (leak ~1e-3, acceptable for the degenerate stacks that
    need it)."""
    dtype = A.dtype
    f32 = dtype == jnp.float32
    if ridge is None:
        ridge = 1e-7 if f32 else 1e-10
    ridge_safe = 1e-5 if f32 else 1e-8
    m = A.shape[0]
    # normalize only genuinely live rows: rows that are cancellation residue
    # (norm ~1e-12 of the largest row, e.g. zero-force rows in flight phase)
    # must NOT be blown up to unit norm — that injects garbage constraints
    # and can make the Gram matrix indefinite at f32.
    # CAVEAT (intentional): the gate is RELATIVE to the largest row, so a
    # real constraint row weighted below row_tol * max_row_norm (e.g. a
    # future 1e-8-weighted task stacked against unit-norm EoM rows) would be
    # silently dropped from the projector. At f32 such rows are numerically
    # indistinguishable from cancellation noise anyway; tasks that must
    # survive belong at a higher hierarchy level, not at a tiny weight.
    rn = jnp.linalg.norm(A, axis=1)
    row_tol = 1e-6 if f32 else 1e-12
    live_r = rn > row_tol * jnp.maximum(jnp.max(rn), 1.0)
    A = jnp.where(live_r[:, None], A / jnp.maximum(rn, 1e-30)[:, None], 0.0)
    G = A @ A.T
    diag = jnp.diagonal(G)
    scale = jnp.maximum(jnp.max(diag), 1.0)
    dead = (diag < 1e-12 * scale).astype(dtype)
    Gc = G + jnp.diag(dead) * scale

    def proj(r):
        M = Gc + r * scale * jnp.eye(m, dtype=dtype)
        chol = jax.scipy.linalg.cho_factor(M)
        pinvA = jax.scipy.linalg.cho_solve(chol, A)     # M^-1 A
        # one iterative-refinement pass (reuses the factorization): knocks
        # the f32 factorization error down by another ~cond*eps factor
        pinvA = pinvA + jax.scipy.linalg.cho_solve(chol, A - M @ pinvA)
        return jnp.eye(A.shape[1], dtype=dtype) - A.T @ pinvA

    P = proj(ridge)
    return jax.lax.cond(jnp.isfinite(P).all(), lambda: P, lambda: proj(ridge_safe))


def solve_hierarchy(tasks: Sequence[Task], qp_iters: int = 30, null_tol=None,
                    nullspace: str = "projector"):
    """Solve the priority cascade. Returns the primal solution x (n,).

    ``tasks`` is ordered highest priority first (task0, task1, task2, ...).
    ``nullspace``: "projector" (Cholesky, TPU fast path) or "svd" (reference).
    """
    n = tasks[0].A.shape[1]
    dtype = tasks[0].A.dtype
    x = jnp.zeros(n, dtype=dtype)
    Z = jnp.eye(n, dtype=dtype)
    prev_ineq = []  # list of (D, f_with_slack)

    for level, task in enumerate(tasks):
        A, b, D, f = task
        nv = D.shape[0]
        AZ = A @ Z
        h_reg = 1e-5 if dtype == jnp.float32 else 1e-9
        if nullspace == "projector":
            # dead directions = range of the processed equality rows; pin
            # their coordinates with the complementary projector
            dead_reg = jnp.eye(n, dtype=dtype) - Z if level > 0 else jnp.zeros((n, n), dtype=dtype)
            H_zz = AZ.T @ AZ + dead_reg + h_reg * jnp.eye(n, dtype=dtype)
        else:
            col_live = (jnp.linalg.norm(Z, axis=0) > 1e-8).astype(dtype)
            H_zz = AZ.T @ AZ + jnp.diag(1.0 - col_live) + h_reg * jnp.eye(n, dtype=dtype)
        c_z = AZ.T @ (A @ x - b)

        # Condensed level solve (qp.solve_qp_slack_batched at B=1): the
        # slack block of the IP Newton system is diagonal and eliminated
        # analytically, shrinking the inner solve from (n+nv)^2 to n^2 —
        # same minimizer (equivalence-tested against the stacked form in
        # tests/test_wbc_batched.py::test_slack_qp_matches_stacked).
        if nv > 0:
            G1 = (D @ Z)[None]
            h1 = (f - D @ x)[None]
        else:
            G1 = jnp.zeros((1, 0, n), dtype=dtype)
            h1 = jnp.zeros((1, 0), dtype=dtype)
        if prev_ineq:
            Gp = jnp.concatenate([Dp @ Z for Dp, _ in prev_ineq], axis=0)[None]
            hp = jnp.concatenate([fp - Dp @ x for Dp, fp in prev_ineq])[None]
        else:
            Gp = jnp.zeros((1, 0, n), dtype=dtype)
            hp = jnp.zeros((1, 0), dtype=dtype)

        zb, vb = solve_qp_slack_batched(H_zz[None], c_z[None], G1, h1,
                                        Gp, hp, iters=qp_iters)
        z, v = zb[0], vb[0]
        x = x + Z @ z

        if nv > 0:
            prev_ineq.append((D, f + v))
        if level < len(tasks) - 1:
            # Null space of ALL equality rows processed so far. Equivalent to
            # the recursive Z <- Z ker(A Z) of HoQp.cpp:126-133 but computed
            # from the stacked rows.
            stacked_A = jnp.concatenate([t.A for t in tasks[: level + 1]], axis=0)
            if nullspace == "projector":
                Z = null_projector(stacked_A)
            else:
                Z = null_space_masked(stacked_A, rel_tol=null_tol)
    return x


# ---------------------------------------------------------------------------
# Batch-major cascade (production batched path)
# ---------------------------------------------------------------------------
#
# vmapping solve_hierarchy leaves XLA's batched cho_factor on the WBC
# critical path 90+ times per tick (3 levels x 30 IP iterations) — the same
# pathology the Riccati sweep had (solver/riccati.py) before its batch-major
# rewrite. These variants carry an explicit leading batch axis so the inner
# SPD solves route onto the lanes-last Pallas Cholesky (ops/pallas_chol).

def _spd_solve_b(M, Y, shift: float, backend: str):
    if backend == "pallas":
        from ..ops.pallas_chol import spd_solve

        # Mosaic constraints: the lane (batch) block must be a multiple of
        # 128 or the whole batch (a 64 tile does not lower), and the
        # unrolled triangular solves hold (k, m, bt) temps that blow the
        # 16 MB scoped-VMEM budget for wide RHS (measured at k=52, m=36)
        # — so wide RHS solve in column chunks, re-factorizing per chunk
        # (factor O(k^3/3) ~ solve O(k^2 m); < 2x total).
        mcols = Y.shape[-1]
        # ch=16 at k=52 sat 36 KB over the 16 MB scoped-vmem limit once the
        # rollout loop also pinned the solve's output block in VMEM
        # (batch-1536 closed-loop compile, round-4 bisect) — halve the
        # chunk for the large null-projector Gram systems.
        ch = 16 if M.shape[-1] <= 48 else 8
        # k > 52: even ch=8 overruns the default 16 MB scoped-VMEM budget
        # (ft stack's 58x58 null-projector Gram measured 18.04 MB of kernel
        # stack); raise the kernel budget instead of shrinking further
        vmem = 32 if M.shape[-1] > 52 else None
        if mcols <= ch:
            return spd_solve(M, Y, shift=shift, batch_tile=128,
                             vmem_limit_mb=vmem)
        outs = [
            spd_solve(M, Y[..., i:i + ch], shift=shift, batch_tile=128,
                      vmem_limit_mb=vmem)
            for i in range(0, mcols, ch)
        ]
        return jnp.concatenate(outs, axis=-1)

    def one(m_, y_):
        k = m_.shape[0]
        chol = jax.scipy.linalg.cho_factor(m_ + shift * jnp.eye(k, dtype=m_.dtype))
        return jax.scipy.linalg.cho_solve(chol, y_)

    return jax.vmap(one)(M, Y)


def null_projector_batched(A, backend: str = "xla", ridge=None):
    """Batched :func:`null_projector`: A (B,m,n) -> projector (B,n,n).

    Same row equilibration, iterative refinement, and tiered ridge as the
    single-problem path (see :func:`null_projector` for the rationale). The
    fallback here is a per-element select: both ridges are computed — the
    projector is ~3% of a tick next to the 90 PDIP Newton solves."""
    dtype = A.dtype
    f32 = dtype == jnp.float32
    if ridge is None:
        ridge = 1e-7 if f32 else 1e-10
    ridge_safe = 1e-5 if f32 else 1e-8
    B, m, n = A.shape
    rn = jnp.linalg.norm(A, axis=-1)                          # (B,m)
    row_tol = 1e-6 if f32 else 1e-12
    live_r = rn > row_tol * jnp.maximum(jnp.max(rn, axis=-1, keepdims=True), 1.0)
    A = jnp.where(live_r[..., None], A / jnp.maximum(rn, 1e-30)[..., None], 0.0)
    AT = jnp.swapaxes(A, -1, -2)
    G = A @ AT
    diag = jnp.diagonal(G, axis1=-2, axis2=-1)                # (B,m)
    scale = jnp.maximum(jnp.max(diag, axis=-1), 1.0)          # (B,)
    dead = (diag < 1e-12 * scale[:, None]).astype(dtype)      # (B,m)
    eye_m = jnp.eye(m, dtype=dtype)
    Gc = G + eye_m[None] * (dead * scale[:, None])[:, :, None]

    def proj(r):
        M = Gc + (r * scale)[:, None, None] * eye_m[None]
        pinvA = _spd_solve_b(M, A, 0.0, backend)
        pinvA = pinvA + _spd_solve_b(M, A - M @ pinvA, 0.0, backend)
        return jnp.eye(n, dtype=dtype)[None] - AT @ pinvA

    P = proj(ridge)
    ok = jnp.isfinite(P).all(axis=(-2, -1))
    P_safe = proj(ridge_safe)
    return jnp.where(ok[:, None, None], P, P_safe)


def solve_hierarchy_batched(tasks: Sequence[Task], qp_iters: int = 30,
                            backend: str = "xla"):
    """Batch-major :func:`solve_hierarchy`: every Task leaf carries a leading
    batch axis (A (B,r,n), b (B,r), D (B,q,n), f (B,q)). Same cascade math;
    the QP Newton systems and the null projectors run through the batched
    SPD solver so the Pallas kernel composes. Returns x (B,n)."""
    B, _, n = tasks[0].A.shape
    dtype = tasks[0].A.dtype
    x = jnp.zeros((B, n), dtype=dtype)
    eye_n = jnp.eye(n, dtype=dtype)
    Z = jnp.broadcast_to(eye_n, (B, n, n))
    prev_ineq = []

    for level, task in enumerate(tasks):
        A, b, D, f = task
        nv = D.shape[1]
        AZ = A @ Z
        AZT = jnp.swapaxes(AZ, -1, -2)
        h_reg = 1e-5 if dtype == jnp.float32 else 1e-9
        dead_reg = eye_n[None] - Z if level > 0 else jnp.zeros((B, n, n), dtype=dtype)
        H_zz = AZT @ AZ + dead_reg + h_reg * eye_n[None]
        c_z = jnp.einsum("bij,bj->bi", AZT, jnp.einsum("bij,bj->bi", A, x) - b)

        # Condensed HoQp level solve (qp.solve_qp_slack_batched): the slack
        # block is eliminated analytically, so the IP Newton system stays
        # (n, n) — the (n+nv)^2 stacked form (92^2 in production) exceeded
        # the Pallas kernel's scoped-VMEM budget and 10x'd the factor FLOPs.
        if nv > 0:
            G1 = D @ Z
            h1 = f - jnp.einsum("bij,bj->bi", D, x)
        else:
            G1 = jnp.zeros((B, 0, n), dtype=dtype)
            h1 = jnp.zeros((B, 0), dtype=dtype)
        if prev_ineq:
            Gp = jnp.concatenate([Dp @ Z for Dp, _ in prev_ineq], axis=1)
            hp = jnp.concatenate(
                [fp - jnp.einsum("bij,bj->bi", Dp, x) for Dp, fp in prev_ineq],
                axis=-1)
        else:
            Gp = jnp.zeros((B, 0, n), dtype=dtype)
            hp = jnp.zeros((B, 0), dtype=dtype)

        z, v = solve_qp_slack_batched(H_zz, c_z, G1, h1, Gp, hp,
                                      iters=qp_iters, backend=backend)
        x = x + jnp.einsum("bij,bj->bi", Z, z)

        if nv > 0:
            prev_ineq.append((D, f + v))
        if level < len(tasks) - 1:
            stacked_A = jnp.concatenate([t.A for t in tasks[: level + 1]], axis=1)
            Z = null_projector_batched(stacked_A, backend=backend)
    return x
