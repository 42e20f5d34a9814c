"""Dense inequality-constrained QP solver (qpOASES replacement).

    min_z  1/2 z'Hz + c'z   s.t.  G z <= h

Infeasible-start primal-dual interior point with a fixed iteration count —
fully branch-free, fixed-shape, batchable with vmap (the reference solves 3
such QPs per 2 ms WBC tick with qpOASES, qm_wbc/src/HoQp.cpp:135-150; here
thousands of them solve in parallel on one chip).

Masked (inactive) constraint rows are encoded as zero rows with h > 0: their
multipliers converge to ~0 and never influence the step.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("iters",))
def solve_qp(H, c, G, h, iters: int = 30):
    """Solve min 1/2 z'Hz + c'z s.t. Gz <= h. Returns (z, lam, s).

    H must be positive definite (callers add regularization on padded dims).
    """
    n = H.shape[0]
    m = G.shape[0]
    dtype = H.dtype

    z = jnp.zeros(n, dtype=dtype)
    s = jnp.ones(m, dtype=dtype)
    lam = jnp.ones(m, dtype=dtype)

    def body(_, carry):
        z, s, lam = carry
        mu = jnp.dot(lam, s) / m
        # Freeze once converged: s, lam underflow past ~1e-16 and the scaled
        # Newton system turns to NaN if iterated further.
        proceed = mu > 1e-13
        sigma = 0.1
        target = sigma * mu

        r_d = H @ z + c + G.T @ lam
        r_p = G @ z + s - h

        w = lam / jnp.maximum(s, 1e-300)  # (m,)
        # Eliminate (ds, dlam):
        #   ds = -r_p - G dz
        #   dlam = (target - lam*s - lam*ds)/s = (target/s - lam) + w (r_p + G dz)
        # KKT: H dz + G' dlam = -r_d
        #   => (H + G' W G) dz = -r_d - G'(target/s - lam + w r_p)
        M = H + G.T @ (w[:, None] * G)
        rhs = -r_d - G.T @ (target / s - lam + w * r_p)
        chol = jax.scipy.linalg.cho_factor(M + 1e-11 * jnp.eye(n, dtype=dtype))
        dz = jax.scipy.linalg.cho_solve(chol, rhs)
        ds = -r_p - G @ dz
        dlam = target / s - lam - w * ds

        # fraction-to-boundary
        tau = 0.995

        def max_step(v, dv):
            ratio = jnp.where(dv < 0, -v / jnp.where(dv < 0, dv, -1.0), jnp.inf)
            return jnp.minimum(1.0, tau * jnp.min(ratio))

        alpha = jnp.minimum(max_step(s, ds), max_step(lam, dlam))
        z = jnp.where(proceed, z + alpha * dz, z)
        s = jnp.where(proceed, s + alpha * ds, s)
        lam = jnp.where(proceed, lam + alpha * dlam, lam)
        return z, s, lam

    z, s, lam = jax.lax.fori_loop(0, iters, body, (z, s, lam))
    return z, lam, s
