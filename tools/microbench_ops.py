#!/usr/bin/env python
"""True per-op device timings via chained fori_loop repetition.

Each candidate op is repeated R times inside ONE jit with a data dependency
(output feeds the next iteration), so tunnel dispatch/fetch latency (~30 ms
per call through axon) amortizes away and XLA cannot CSE the repeats.

Usage: QM_MB_BATCH=256 QM_MB_R=100 python tools/microbench_ops.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    jax.config.update("jax_default_matmul_precision", "highest")
    B = int(os.environ.get("QM_MB_BATCH", "256"))
    R = int(os.environ.get("QM_MB_R", "100"))
    n = 30
    dtype = jnp.float32
    rng = np.random.default_rng(0)

    W = rng.normal(size=(B, n, n))
    A0 = jnp.asarray(W @ W.transpose(0, 2, 1) + 2 * np.eye(n), dtype)
    M0 = jnp.asarray(0.1 * rng.normal(size=(B, n, n)), dtype)
    Y0 = jnp.asarray(rng.normal(size=(B, n, n + 1)), dtype)

    def chain_time(name, body, init, reps=3):
        """body: carry -> carry. Returns per-iteration us."""
        f = jax.jit(lambda c: jax.lax.fori_loop(0, R, lambda i, cc: body(cc), c))
        out = f(init)
        float(jax.tree.leaves(out)[0].reshape(-1)[0])  # warm, incl. fetch
        t0 = time.time()
        for _ in range(reps):
            out = f(init)
            float(jax.tree.leaves(out)[0].reshape(-1)[0])
        us = 1e6 * (time.time() - t0) / reps / R
        print(f"{name:>52}: {us:9.1f} us/iter", flush=True)
        return us

    print(f"batch={B} R={R} device={jax.devices()[0]}", flush=True)

    # single batched matmul, data-chained
    chain_time("batched matmul (B,30,30)@(B,30,30)",
               lambda c: 0.5 * (c @ M0), A0)
    chain_time("batched matmul A.T@B (transposed lhs)",
               lambda c: 0.5 * (jnp.swapaxes(c, -1, -2) @ M0), A0)
    chain_time("batched matvec (B,30,30)@(B,30)",
               lambda c: (jnp.einsum("bij,bj->bi", M0, c[..., 0])[..., None]
                          * jnp.ones_like(c) * 0.1 + c * 0.5),
               A0)

    # lanes-last "fmm" matmul in pure XLA: matrices (30, 30, B), contraction
    # as broadcast multiply + sum so the batch stays on the minor (lane) axis
    A0_ll = jnp.transpose(A0, (1, 2, 0))
    M0_ll = jnp.transpose(M0, (1, 2, 0))

    def ll_mm(a, b):
        # (i,k,B) @ (k,j,B) -> (i,j,B)
        return jnp.sum(a[:, :, None, :] * b[None, :, :, :], axis=1)

    chain_time("lanes-last fmm matmul (30,30,B)",
               lambda c: 0.5 * ll_mm(c, M0_ll), A0_ll)

    def ll_mm_unrolled(a, b):
        acc = a[:, 0, None, :] * b[None, 0, :, :]
        for k in range(1, n):
            acc = acc + a[:, k, None, :] * b[None, k, :, :]
        return acc

    chain_time("lanes-last unrolled matmul (30,30,B)",
               lambda c: 0.5 * ll_mm_unrolled(c, M0_ll), A0_ll)

    # default (bf16-operand) precision batched matmul for comparison
    def mm_bf16(c):
        with jax.default_matmul_precision("default"):
            return 0.5 * (c @ M0)

    chain_time("batched matmul DEFAULT precision", mm_bf16, A0)

    # wider batched matmul: does (B,60,60) pad better?
    M60 = jnp.asarray(0.1 * rng.normal(size=(B, 60, 60)), dtype)
    chain_time("batched matmul (B,60,60)@(B,60,60)",
               lambda c: 0.5 * (c @ M60), M60 + jnp.eye(60, dtype=dtype))
    M120 = jnp.asarray(0.1 * rng.normal(size=(B // 4, 120, 120)), dtype)
    chain_time("batched matmul (B/4,120,120)@",
               lambda c: 0.5 * (c @ M120), M120 + jnp.eye(120, dtype=dtype))

    def cho(c):
        Q = c + jnp.swapaxes(c, -1, -2) + 3.0 * jnp.eye(n, dtype=dtype)

        def one(q, y):
            ch = jax.scipy.linalg.cho_factor(q)
            return jax.scipy.linalg.cho_solve(ch, y)

        X = jax.vmap(one)(Q, Y0)
        return 0.45 * c + 0.05 * X[..., :n]

    chain_time("batched cho_factor+cho_solve (B,30,31)", cho, A0)

    from qm_door_tpu.ops.pallas_chol import spd_solve

    def cho_pallas(c):
        Q = c + jnp.swapaxes(c, -1, -2) + 3.0 * jnp.eye(n, dtype=dtype)
        X = spd_solve(Q, Y0)
        return 0.45 * c + 0.05 * X[..., :n]

    chain_time("pallas spd_solve (B,30,31)", cho_pallas, A0)

    # trivial body: isolates the per-iteration loop overhead on this platform
    chain_time("trivial loop body (baseline overhead)",
               lambda c: 0.5 * c + 0.1, A0)

    def lu_solve(c):
        Q = c + jnp.swapaxes(c, -1, -2) + 3.0 * jnp.eye(n, dtype=dtype)
        X = jnp.linalg.solve(Q, Y0)
        return 0.45 * c + 0.05 * X[..., :n]

    chain_time("batched lu solve (B,30,31)", lu_solve, A0)

    # the full riccati backward STEP body (batch-major)
    lxs = jnp.asarray(rng.normal(size=(B, n)), dtype)
    d0 = jnp.asarray(0.01 * rng.normal(size=(B, n)), dtype)

    def ric_step(carry):
        S, s = carry
        Am, Bm = M0 + jnp.eye(n, dtype=dtype), M0
        Sd_s = jnp.einsum("bij,bj->bi", S, d0) + s
        Qx = lxs + jnp.einsum("bji,bj->bi", Am, Sd_s)
        Qu = lxs + jnp.einsum("bji,bj->bi", Bm, Sd_s)
        SA = S @ Am
        SB = S @ Bm
        Qxx = A0 + jnp.einsum("bji,bjk->bik", Am, SA)
        Quu = A0 + jnp.einsum("bji,bjk->bik", Bm, SB)
        Qux = 0.1 * M0 + jnp.einsum("bji,bjk->bik", Bm, SA)
        Quu = 0.5 * (Quu + jnp.swapaxes(Quu, -1, -2)) + 3.0 * jnp.eye(n, dtype=dtype)

        def one(q, r):
            ch = jax.scipy.linalg.cho_factor(q)
            return jax.scipy.linalg.cho_solve(ch, r)

        rhs = jnp.concatenate([Qux, Qu[..., None]], axis=-1)
        sol = -jax.vmap(one)(Quu, rhs)
        K, kff = sol[..., :n], sol[..., n]
        QuxT = jnp.swapaxes(Qux, -1, -2)
        S_new = Qxx + QuxT @ K
        S_new = 0.5 * (S_new + jnp.swapaxes(S_new, -1, -2))
        s_new = Qx + jnp.einsum("bij,bj->bi", QuxT, kff)
        # keep bounded
        S_new = 0.02 * S_new / (1.0 + jnp.abs(S_new)) + 0.9 * S
        return (S_new, 0.5 * s_new / (1.0 + jnp.abs(s_new)) + 0.5 * s)

    chain_time("full riccati backward step body", ric_step,
               (A0, lxs))

    def ric_step_nochol(carry):
        S, s = carry
        Am, Bm = M0 + jnp.eye(n, dtype=dtype), M0
        Sd_s = jnp.einsum("bij,bj->bi", S, d0) + s
        Qx = lxs + jnp.einsum("bji,bj->bi", Am, Sd_s)
        SA = S @ Am
        SB = S @ Bm
        Qxx = A0 + jnp.einsum("bji,bjk->bik", Am, SA)
        Quu = A0 + jnp.einsum("bji,bjk->bik", Bm, SB)
        Qux = 0.1 * M0 + jnp.einsum("bji,bjk->bik", Bm, SA)
        S_new = Qxx + 1e-3 * Quu + 1e-3 * jnp.swapaxes(Qux, -1, -2)
        S_new = 0.02 * S_new / (1.0 + jnp.abs(S_new)) + 0.9 * S
        return (S_new, 0.5 * Qx / (1.0 + jnp.abs(Qx)) + 0.5 * s)

    chain_time("riccati step body WITHOUT gain solve", ric_step_nochol,
               (A0, lxs))


if __name__ == "__main__":
    main()
