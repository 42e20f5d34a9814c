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
    The problem is Jacobi-equilibrated internally (variable scaling from
    diag(H), constraint-row normalization) — WBC task stacks mix units across
    five orders of magnitude and f32 needs the conditioning headroom.
    """
    n = H.shape[0]
    m = G.shape[0]
    dtype = H.dtype
    f32 = dtype == jnp.float32
    # dtype-aware guards: the f64 constants underflow/overwhelm f32 —
    # 1e-300 flushes to 0 (division blowup) and mu below ~1e-6 is noise.
    mu_tol = 1e-5 if f32 else 1e-10
    tiny = 1e-25 if f32 else 1e-300
    w_max = 1e6 if f32 else 1e12
    jitter = 1e-6 if f32 else 1e-11

    # --- Jacobi equilibration: z = D z~, rows of G scaled by E ------------
    dH = jnp.diagonal(H)
    # absolute floor only: unit-scaled variables (slacks) keep d = 1, while
    # the 1e4..1e6 task-Gram diagonals get compressed toward unity
    d = 1.0 / jnp.sqrt(jnp.maximum(dH, 1e-8))
    H = H * d[:, None] * d[None, :]
    c = c * d
    Gd = G * d[None, :]
    row_norm = jnp.linalg.norm(Gd, axis=1)
    e = 1.0 / jnp.maximum(row_norm, 1.0)
    G = Gd * e[:, None]
    h = h * e

    z = jnp.zeros(n, dtype=dtype)
    s = jnp.ones(m, dtype=dtype)
    lam = jnp.ones(m, dtype=dtype)

    def body(_, carry):
        z, s, lam = carry
        mu = jnp.dot(lam, s) / m
        # Freeze once converged: s, lam underflow and the scaled Newton
        # system turns to NaN if iterated further.
        proceed = mu > mu_tol
        sigma = 0.1
        target = sigma * mu

        r_d = H @ z + c + G.T @ lam
        r_p = G @ z + s - h

        s_safe = jnp.maximum(s, tiny)
        w = jnp.clip(lam / s_safe, 0.0, w_max)  # (m,)
        # Eliminate (ds, dlam):
        #   ds = -r_p - G dz
        #   dlam = (target - lam*s - lam*ds)/s = (target/s - lam) + w (r_p + G dz)
        # KKT: H dz + G' dlam = -r_d
        #   => (H + G' W G) dz = -r_d - G'(target/s - lam + w r_p)
        M = H + G.T @ (w[:, None] * G)
        rhs = -r_d - G.T @ (target / s_safe - lam + w * r_p)
        chol = jax.scipy.linalg.cho_factor(M + jitter * jnp.eye(n, dtype=dtype))
        dz = jax.scipy.linalg.cho_solve(chol, rhs)
        ds = -r_p - G @ dz
        dlam = target / s_safe - lam - w * ds

        # fraction-to-boundary
        tau = 0.995

        def max_step(v, dv):
            ratio = jnp.where(dv < 0, -v / jnp.where(dv < 0, dv, -1.0), jnp.inf)
            return jnp.minimum(1.0, tau * jnp.min(ratio))

        alpha = jnp.minimum(max_step(s, ds), max_step(lam, dlam))
        # reject non-finite Newton steps (degenerate complementarity can blow
        # up the scaled system right at convergence)
        ok = proceed & jnp.isfinite(dz).all() & jnp.isfinite(ds).all() & jnp.isfinite(dlam).all()
        z = jnp.where(ok, z + alpha * dz, z)
        s = jnp.where(ok, s + alpha * ds, s)
        lam = jnp.where(ok, lam + alpha * dlam, lam)
        return z, s, lam

    z, s, lam = jax.lax.fori_loop(0, iters, body, (z, s, lam))

    # Active-set polish (f32 only): the interior point freezes at mu_tol,
    # leaving an O(mu_tol/curvature) primal bias that lands different-rounding
    # runs (vmapped vs batch-major) on visibly different minimizers in flat
    # directions. Snap the primal to the KKT point of the identified active
    # set (penalty form): inactive rows drop out, active rows get a stiff
    # quadratic penalty. Binary classification (lam > s in scaled space)
    # makes the polished point deterministic given the active set. At f64 the
    # PDIP converges to mu ~1e-10 on its own and the 1e12-penalty solve would
    # only add factorization noise, so the polish is skipped there.
    if f32:
        act = (lam > s).astype(dtype) * 1e6
        Mp = H + G.T @ (act[:, None] * G)
        rhs_p = -c + G.T @ (act * h)
        chol_p = jax.scipy.linalg.cho_factor(Mp + jitter * jnp.eye(n, dtype=dtype))
        z_p = jax.scipy.linalg.cho_solve(chol_p, rhs_p)
        # keep the polish only if finite and not violating feasibility —
        # measured in ORIGINAL (pre-equilibration) units: scaled rows were
        # divided by their norm, so the scaled residual understates the true
        # violation of heavily-weighted rows by up to that norm.
        viol = jnp.max((G @ z_p - h) / jnp.maximum(e, tiny), initial=-jnp.inf)
        ok_p = jnp.isfinite(z_p).all() & (viol < 1e-4)
        z = jnp.where(ok_p, z_p, z)
        # keep the returned slack consistent with the (possibly) polished
        # primal; lam stays the pre-polish PDIP multiplier (approximate —
        # callers in hoqp.py use only z, the duals are informational).
        s = jnp.where(ok_p, h - G @ z_p, s)

    # undo equilibration: primal z = D z~, dual lam = E lam~, slack s = s~/E
    return d * z, e * lam, s / jnp.maximum(e, tiny)


def _spd_solve_batched(M, rhs, shift: float, backend: str):
    """Batched Newton-system solve: M (B,k,k) SPD, rhs (B,k) -> (B,k).

    ``backend``: "pallas" routes onto the lanes-last Cholesky kernel
    (ops/pallas_chol) — the vmapped XLA cho_factor at (B,~90,90) is the
    dominant WBC cost on TPU, same pathology the Riccati sweep hit
    (solver/riccati.py). "xla" is the reference path (CPU default).
    """
    if backend == "pallas":
        from ..ops.pallas_chol import spd_solve

        # lane tile must be a multiple of 128 (Mosaic) — a (k,k,128) block
        # is 4.3 MB at the largest k=92, well inside VMEM with a 1-col rhs
        return spd_solve(M, rhs[..., None], shift=shift, batch_tile=128)[..., 0]

    def one(m_, r_):
        k = m_.shape[0]
        chol = jax.scipy.linalg.cho_factor(m_ + shift * jnp.eye(k, dtype=m_.dtype))
        return jax.scipy.linalg.cho_solve(chol, r_)

    return jax.vmap(one)(M, rhs)


@partial(jax.jit, static_argnames=("iters", "backend"))
def solve_qp_batched(H, c, G, h, iters: int = 30, backend: str = "xla"):
    """Batch-major :func:`solve_qp`: H (B,n,n), c (B,n), G (B,m,n), h (B,m).

    Identical iteration math to the per-problem solver (same equilibration,
    guards, and freeze logic), with the inner Newton solve routed through
    :func:`_spd_solve_batched` so the Pallas kernel can sit on the hot path
    (a kernel has no vmap batching rule; batch-major is how it composes).
    Returns (z, lam, s) each with leading batch dim.
    """
    B, n, _ = H.shape
    m = G.shape[1]
    dtype = H.dtype
    f32 = dtype == jnp.float32
    mu_tol = 1e-5 if f32 else 1e-10
    tiny = 1e-25 if f32 else 1e-300
    w_max = 1e6 if f32 else 1e12
    jitter = 1e-6 if f32 else 1e-11

    dH = jnp.diagonal(H, axis1=-2, axis2=-1)
    d = 1.0 / jnp.sqrt(jnp.maximum(dH, 1e-8))
    H = H * d[:, :, None] * d[:, None, :]
    c = c * d
    Gd = G * d[:, None, :]
    row_norm = jnp.linalg.norm(Gd, axis=-1)
    e = 1.0 / jnp.maximum(row_norm, 1.0)
    G = Gd * e[..., None]
    h = h * e
    GT = jnp.swapaxes(G, -1, -2)

    z = jnp.zeros((B, n), dtype=dtype)
    s = jnp.ones((B, m), dtype=dtype)
    lam = jnp.ones((B, m), dtype=dtype)

    def body(_, carry):
        z, s, lam = carry
        mu = jnp.sum(lam * s, axis=-1) / m                    # (B,)
        proceed = mu > mu_tol
        target = 0.1 * mu                                     # (B,)

        r_d = jnp.einsum("bij,bj->bi", H, z) + c + jnp.einsum("bji,bj->bi", G, lam)
        r_p = jnp.einsum("bij,bj->bi", G, z) + s - h

        s_safe = jnp.maximum(s, tiny)
        w = jnp.clip(lam / s_safe, 0.0, w_max)                # (B,m)
        M = H + GT @ (w[..., None] * G)
        rhs = -r_d - jnp.einsum(
            "bji,bj->bi", G, target[:, None] / s_safe - lam + w * r_p
        )
        dz = _spd_solve_batched(M, rhs, jitter, backend)
        ds = -r_p - jnp.einsum("bij,bj->bi", G, dz)
        dlam = target[:, None] / s_safe - lam - w * ds

        tau = 0.995

        def max_step(v, dv):
            ratio = jnp.where(dv < 0, -v / jnp.where(dv < 0, dv, -1.0), jnp.inf)
            return jnp.minimum(1.0, tau * jnp.min(ratio, axis=-1))

        alpha = jnp.minimum(max_step(s, ds), max_step(lam, dlam))  # (B,)
        ok = (
            proceed
            & jnp.isfinite(dz).all(axis=-1)
            & jnp.isfinite(ds).all(axis=-1)
            & jnp.isfinite(dlam).all(axis=-1)
        )
        okn = ok[:, None]
        a = alpha[:, None]
        z = jnp.where(okn, z + a * dz, z)
        s = jnp.where(okn, s + a * ds, s)
        lam = jnp.where(okn, lam + a * dlam, lam)
        return z, s, lam

    z, s, lam = jax.lax.fori_loop(0, iters, body, (z, s, lam))

    # active-set polish, f32 only (see solve_qp for rationale)
    if f32:
        act = (lam > s).astype(dtype) * 1e6
        Mp = H + GT @ (act[..., None] * G)
        rhs_p = -c + jnp.einsum("bji,bj->bi", G, act * h)
        z_p = _spd_solve_batched(Mp, rhs_p, jitter, backend)
        # feasibility gate in ORIGINAL units (divide the scaled residual by e)
        resid = jnp.einsum("bij,bj->bi", G, z_p) - h
        viol = jnp.max(resid / jnp.maximum(e, tiny), axis=-1)
        ok_p = jnp.isfinite(z_p).all(axis=-1) & (viol < 1e-4)
        z = jnp.where(ok_p[:, None], z_p, z)
        s = jnp.where(ok_p[:, None], -resid, s)  # slack consistent with z

    return d * z, e * lam, s / jnp.maximum(e, tiny)


@partial(jax.jit, static_argnames=("iters", "backend"))
def solve_qp_slack_batched(Hz, cz, G1, h1, Gp, hp, iters: int = 30,
                           backend: str = "xla"):
    """HoQp-structured batched IP solve with the slack block eliminated.

    Solves, per batch element, the level QP HoQp stacks
    (wbc/hoqp.py:solve_hierarchy_batched; reference HoQp.cpp formulation):

        min_{z,v}  1/2 z'Hz z + cz'z + 1/2 v'v
        s.t.       G1 z - v <= h1        (level inequalities, slacked)
                   -v <= 0               (slack positivity)
                   Gp z <= hp            (inherited, frozen slacks)

    Identical math to stacking [z; v] through :func:`solve_qp_batched` —
    but the IP Newton system's (v, v) block is DIAGONAL (I + w1 + w2), so
    the slack rows are eliminated analytically and the SPD solve shrinks
    from (n + nv)^2 (92^2 in the production WBC, which exceeds the Pallas
    kernel's scoped-VMEM budget and Mosaic's lane-tile rules) to n^2
    (36/42) — exactly the shape ops/pallas_chol is built for, at ~1/10th
    the factorization FLOPs.

    Shapes: Hz (B,n,n), cz (B,n), G1 (B,nv,n), h1 (B,nv), Gp (B,mp,n),
    hp (B,mp); nv or mp may be 0. Returns (z (B,n), v (B,nv)).
    """
    B, n, _ = Hz.shape
    nv = G1.shape[1]
    mp = Gp.shape[1]
    dtype = Hz.dtype
    f32 = dtype == jnp.float32
    mu_tol = 1e-5 if f32 else 1e-10
    tiny = 1e-25 if f32 else 1e-300
    w_max = 1e6 if f32 else 1e12
    jitter = 1e-6 if f32 else 1e-11

    # Jacobi equilibration, mirroring solve_qp_batched on the stacked
    # system: diag(H_vv) = 1 so the v columns carry unit scaling; the G1
    # rows' slack entry (-1) joins the row norm; the v >= 0 rows have unit
    # norm (e2 = 1) and drop out of the scaling algebra.
    dH = jnp.diagonal(Hz, axis1=-2, axis2=-1)
    d = 1.0 / jnp.sqrt(jnp.maximum(dH, 1e-8))
    Hz = Hz * d[:, :, None] * d[:, None, :]
    cz = cz * d
    G1d = G1 * d[:, None, :]
    e1 = 1.0 / jnp.maximum(
        jnp.sqrt(jnp.sum(G1d * G1d, axis=-1) + 1.0), 1.0)    # (B,nv)
    G1s = G1d * e1[..., None]
    h1s = h1 * e1
    Gpd = Gp * d[:, None, :]
    ep = 1.0 / jnp.maximum(jnp.linalg.norm(Gpd, axis=-1), 1.0)
    Gps = Gpd * ep[..., None]
    hps = hp * ep
    G1T = jnp.swapaxes(G1s, -1, -2)
    GpT = jnp.swapaxes(Gps, -1, -2)

    if nv == 0 and mp == 0:
        # unconstrained level (e.g. the EoM-only level 0): one SPD solve
        z = _spd_solve_batched(Hz, -cz, jitter, backend)
        return d * z, jnp.zeros((B, 0), dtype=dtype)

    z = jnp.zeros((B, n), dtype=dtype)
    v = jnp.zeros((B, nv), dtype=dtype)
    s1 = jnp.ones((B, nv), dtype=dtype)
    lam1 = jnp.ones((B, nv), dtype=dtype)
    s2 = jnp.ones((B, nv), dtype=dtype)
    lam2 = jnp.ones((B, nv), dtype=dtype)
    sp = jnp.ones((B, mp), dtype=dtype)
    lamp = jnp.ones((B, mp), dtype=dtype)
    m_tot = nv + nv + mp

    def mv(M, x):
        return jnp.einsum("bij,bj->bi", M, x)

    def body(_, carry):
        z, v, s1, lam1, s2, lam2, sp, lamp = carry
        mu = (jnp.sum(lam1 * s1, -1) + jnp.sum(lam2 * s2, -1)
              + jnp.sum(lamp * sp, -1)) / m_tot
        proceed = mu > mu_tol
        target = 0.1 * mu

        r_dz = mv(Hz, z) + cz + mv(G1T, lam1) + mv(GpT, lamp)
        r_dv = v - e1 * lam1 - lam2
        r_p1 = mv(G1s, z) - e1 * v + s1 - h1s
        r_p2 = -v + s2
        r_pp = mv(Gps, z) + sp - hps

        w1 = jnp.clip(lam1 / jnp.maximum(s1, tiny), 0.0, w_max)
        w2 = jnp.clip(lam2 / jnp.maximum(s2, tiny), 0.0, w_max)
        wp = jnp.clip(lamp / jnp.maximum(sp, tiny), 0.0, w_max)
        q1 = target[:, None] / jnp.maximum(s1, tiny) - lam1 + w1 * r_p1
        q2 = target[:, None] / jnp.maximum(s2, tiny) - lam2 + w2 * r_p2
        qp_ = target[:, None] / jnp.maximum(sp, tiny) - lamp + wp * r_pp

        den = 1.0 + e1 * w1 * e1 + w2                       # (B,nv) diag
        w1_t = w1 - (w1 * e1) * (w1 * e1) / den             # Schur weight
        rhs_z = -r_dz - mv(G1T, q1) - mv(GpT, qp_)
        rhs_v = -r_dv + e1 * q1 + q2
        Mred = (Hz + G1T @ (w1_t[..., None] * G1s)
                + GpT @ (wp[..., None] * Gps))
        rhs_red = rhs_z + mv(G1T, (w1 * e1 / den) * rhs_v)
        dz = _spd_solve_batched(Mred, rhs_red, jitter, backend)
        dv = (rhs_v + e1 * w1 * mv(G1s, dz)) / den

        ds1 = -r_p1 - (mv(G1s, dz) - e1 * dv)
        dlam1 = target[:, None] / jnp.maximum(s1, tiny) - lam1 - w1 * ds1
        ds2 = -r_p2 + dv
        dlam2 = target[:, None] / jnp.maximum(s2, tiny) - lam2 - w2 * ds2
        dsp = -r_pp - mv(Gps, dz)
        dlamp = target[:, None] / jnp.maximum(sp, tiny) - lamp - wp * dsp

        tau = 0.995

        def max_step(x, dx):
            ratio = jnp.where(dx < 0, -x / jnp.where(dx < 0, dx, -1.0), jnp.inf)
            ratio = jnp.min(ratio, axis=-1) if ratio.shape[-1] else jnp.full((B,), jnp.inf, dtype)
            return tau * ratio

        alpha = jnp.minimum(1.0, jnp.minimum(
            jnp.minimum(max_step(s1, ds1), max_step(lam1, dlam1)),
            jnp.minimum(
                jnp.minimum(max_step(s2, ds2), max_step(lam2, dlam2)),
                jnp.minimum(max_step(sp, dsp), max_step(lamp, dlamp)))))
        ok = (proceed & jnp.isfinite(dz).all(-1) & jnp.isfinite(dv).all(-1)
              & jnp.isfinite(ds1).all(-1) & jnp.isfinite(dlam1).all(-1)
              & jnp.isfinite(ds2).all(-1) & jnp.isfinite(dlam2).all(-1)
              & jnp.isfinite(dsp).all(-1) & jnp.isfinite(dlamp).all(-1))
        okn = ok[:, None]
        a = alpha[:, None]
        return (jnp.where(okn, z + a * dz, z), jnp.where(okn, v + a * dv, v),
                jnp.where(okn, s1 + a * ds1, s1), jnp.where(okn, lam1 + a * dlam1, lam1),
                jnp.where(okn, s2 + a * ds2, s2), jnp.where(okn, lam2 + a * dlam2, lam2),
                jnp.where(okn, sp + a * dsp, sp), jnp.where(okn, lamp + a * dlamp, lamp))

    z, v, s1, lam1, s2, lam2, sp, lamp = jax.lax.fori_loop(
        0, iters, body, (z, v, s1, lam1, s2, lam2, sp, lamp))

    if f32:
        # active-set polish in the condensed space (see solve_qp)
        a1 = (lam1 > s1).astype(dtype) * 1e6
        a2 = (lam2 > s2).astype(dtype) * 1e6
        ap = (lamp > sp).astype(dtype) * 1e6
        denp = 1.0 + e1 * a1 * e1 + a2
        a1_t = a1 - (a1 * e1) * (a1 * e1) / denp
        rhs_z = -cz + mv(G1T, a1 * h1s) + mv(GpT, ap * hps)
        rhs_v = -e1 * (a1 * h1s)
        Mp = (Hz + G1T @ (a1_t[..., None] * G1s)
              + GpT @ (ap[..., None] * Gps))
        rhs_p = rhs_z + mv(G1T, (a1 * e1 / denp) * rhs_v)
        z_p = _spd_solve_batched(Mp, rhs_p, jitter, backend)
        v_p = (rhs_v + e1 * a1 * mv(G1s, z_p)) / denp
        # feasibility gate in ORIGINAL units across all three row groups
        r1 = (mv(G1s, z_p) - e1 * v_p - h1s) / jnp.maximum(e1, tiny)
        r2 = -v_p
        rp = (mv(Gps, z_p) - hps) / jnp.maximum(ep, tiny)
        viol = jnp.maximum(
            jnp.max(r1, -1, initial=-jnp.inf),
            jnp.maximum(jnp.max(r2, -1, initial=-jnp.inf),
                        jnp.max(rp, -1, initial=-jnp.inf)))
        ok_p = (jnp.isfinite(z_p).all(-1) & jnp.isfinite(v_p).all(-1)
                & (viol < 1e-4))
        z = jnp.where(ok_p[:, None], z_p, z)
        v = jnp.where(ok_p[:, None], v_p, v)

    return d * z, v
