"""Associative-scan (parallel) Riccati LQ solve — O(log N) depth over the
horizon instead of the sequential sweep's O(N).

This is the sequence-parallel slot of the framework (SURVEY.md §5): the
reference's HPIPM runs an inherently sequential Riccati recursion over ~67
nodes; here the value-function recursion is reformulated as an associative
operator (Särkkä & García-Fernández, "Temporal Parallelization of Bayesian
Smoothers", arXiv:1905.13002, LQT section) and evaluated with
``jax.lax.associative_scan``, so long horizons cost log-depth on TPU.

Handling of our generalized stage costs (cross terms lux, linear terms
lx/lu): each stage is first reduced to standard LQT form by completing the
square in u:
    u = K0 x + k0 + u~,   K0 = -luu^-1 lux,  k0 = -luu^-1 lu
which leaves control cost 1/2 u~' luu u~, modified dynamics
    x' = (A + B K0) x + (d + B k0) + B u~
and stage state cost X = lxx - lux' luu^-1 lux, linear term
r = lx - lux' luu^-1 lu.

Value functions are parametrized V_k(x) = 1/2 x'J x - eta'x + const; the
suffix-combined elements give (J_k, eta_k) at every node in one scan, and the
feedback gains follow with one batched solve.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .transcription import ProjectedLq


def _sym(M):
    return 0.5 * (M + jnp.swapaxes(M, -1, -2))


def _stage_standard_form(lq: ProjectedLq):
    """Complete the square in u for every stage (vectorized over k)."""

    def per_stage(luu, lux, lu, B):
        chol = jax.scipy.linalg.cho_factor(luu)
        K0 = -jax.scipy.linalg.cho_solve(chol, lux)
        k0 = -jax.scipy.linalg.cho_solve(chol, lu)
        BU = jax.scipy.linalg.cho_solve(chol, B.T)
        return K0, k0, BU

    K0, k0, BU = jax.vmap(per_stage)(lq.luu, lq.lux, lq.lu, lq.B)

    F = lq.A + lq.B @ K0
    c = lq.d + jnp.einsum("kij,kj->ki", lq.B, k0)
    X = _sym(lq.lxx + jnp.einsum("kui,kuj->kij", lq.lux, K0))
    r = lq.lx + jnp.einsum("kui,ku->ki", lq.lux, k0)
    C = _sym(lq.B @ BU)  # B luu^-1 B^T
    return K0, k0, F, c, X, r, C


def _combine(e1, e2):
    """Associative combination: e1 covers the earlier segment."""
    A1, b1, C1, eta1, J1 = e1
    A2, b2, C2, eta2, J2 = e2
    n = A1.shape[-1]
    I = jnp.eye(n, dtype=A1.dtype)
    # (I + C1 J2)^-1 via LU solve
    M = I + C1 @ J2
    A2M = jnp.linalg.solve(jnp.swapaxes(M, -1, -2), jnp.swapaxes(A2, -1, -2))
    A2M = jnp.swapaxes(A2M, -1, -2)            # A2 M^-1
    A = A2M @ A1
    b = (A2M @ (b1 + (C1 @ eta2[..., None])[..., 0])[..., None])[..., 0] + b2
    C = _sym(A2M @ C1 @ jnp.swapaxes(A2, -1, -2) + C2)
    # (I + J2 C1)^-1 applied from the left to (eta2 - J2 b1) and J2 A1
    Mt = I + J2 @ C1
    rhs = jnp.concatenate(
        [(eta2 - (J2 @ b1[..., None])[..., 0])[..., None], J2 @ A1], axis=-1
    )
    sol = jnp.linalg.solve(Mt, rhs)
    eta = (jnp.swapaxes(A1, -1, -2) @ sol[..., :1])[..., 0] + eta1
    J = _sym(jnp.swapaxes(A1, -1, -2) @ sol[..., 1:] + J1)
    return A, b, C, eta, J


def parallel_riccati_backward(lq: ProjectedLq):
    """Value functions at every node via associative scan.

    Returns (K (N,nu,nx), kff (N,nu)) — identical (up to roundoff) to
    riccati.riccati_backward.
    """
    N, nx = lq.A.shape[0], lq.A.shape[1]
    dtype = lq.A.dtype
    K0, k0, F, c, X, r, C = _stage_standard_form(lq)

    # stage elements k = 0..N-1
    elems = (F, c, C, -r, X)
    # terminal element
    zero = jnp.zeros((1, nx, nx), dtype=dtype)
    zerov = jnp.zeros((1, nx), dtype=dtype)
    term = (zero, zerov, zero, -lq.lx_f[None], lq.lxx_f[None])
    elems = jax.tree.map(
        lambda s, t: jnp.concatenate([s, t], axis=0), elems, term
    )

    # reverse=True composes later-to-earlier: fn receives (later, earlier),
    # while _combine(e1, e2) takes e1 = earlier — swap the arguments.
    combined = jax.lax.associative_scan(
        lambda a, b: _combine(b, a), elems, reverse=True, axis=0
    )
    _, _, _, eta_all, J_all = combined
    # V_{k+1} parameters for stage k are the suffix starting at k+1.
    Jn = J_all[1:]     # (N, nx, nx)
    etan = eta_all[1:]  # (N, nx)

    # gains: u~ = -(luu + B'J'B)^-1 B' (J'(F0 x + d) - eta')  with original A, B
    BtJ = jnp.swapaxes(lq.B, -1, -2) @ Jn
    Quu = lq.luu + BtJ @ lq.B
    Qux = BtJ @ lq.A
    qu = (BtJ @ lq.d[..., None])[..., 0] - jnp.einsum(
        "kij,kj->ki", jnp.swapaxes(lq.B, -1, -2), etan
    )

    def solve_gain(Quu_k, Qux_k, qu_k, lux_k, lu_k):
        cholk = jax.scipy.linalg.cho_factor(_sym(Quu_k))
        K = -jax.scipy.linalg.cho_solve(cholk, Qux_k + lux_k)
        kff = -jax.scipy.linalg.cho_solve(cholk, qu_k + lu_k)
        return K, kff

    K, kff = jax.vmap(solve_gain)(Quu, Qux, qu, lq.lux, lq.lu)
    return K, kff


def parallel_lqr_solve(lq: ProjectedLq, dx0):
    """Backward (parallel) + forward rollout. The forward pass is the
    sequential closed-loop rollout (cheap: N small matvecs); a fully parallel
    forward pass via a second associative scan is available for very long
    horizons (see ops/assoc_affine.py)."""
    from .riccati import riccati_forward

    K, kff = parallel_riccati_backward(lq)
    return riccati_forward(lq, K, kff, dx0) + (K, kff)


def parallel_forward_rollout(A_cl, b_cl, dx0):
    """Affine rollout dx_{k+1} = A_cl dx_k + b_cl via associative scan."""
    def comb(e1, e2):
        A1, b1 = e1
        A2, b2 = e2
        return A2 @ A1, (A2 @ b1[..., None])[..., 0] + b2

    A_all, b_all = jax.lax.associative_scan(comb, (A_cl, b_cl), axis=0)
    dx = (A_all @ dx0[..., None])[..., 0] + b_all
    return jnp.concatenate([dx0[None], dx], axis=0)
