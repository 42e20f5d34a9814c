#!/usr/bin/env python
"""Microbenchmarks locating the cost inside the XLA projected-LQ solve.

Times, at production shapes (batch B, n=30), the candidate hot primitives:
  - batched 30x30 matmul chains (the Riccati Q assembly),
  - batched cho_factor+cho_solve (the gain solve) in XLA,
  - ops/pallas_chol.spd_solve (lanes-last Pallas Cholesky),
  - the full riccati_backward scan, and a variant with the gain solve
    replaced by the Pallas kernel.

Usage: QM_MB_BATCH=256 python tools/microbench_lq.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def _fetch(out):
    """Force a host round-trip: block_until_ready alone has been observed
    returning early through the axon tunnel."""
    leaf = jax.tree.leaves(out)[0]
    return float(leaf.reshape(-1)[0])


def timed(name, fn, *args, reps=50):
    _fetch(fn(*args))
    t0 = time.time()
    acc = 0.0
    for _ in range(reps):
        acc += _fetch(fn(*args))
    ms = 1e3 * (time.time() - t0) / reps
    print(f"{name:>44}: {ms:9.3f} ms  [acc={acc:.2e}]", flush=True)
    return ms


def main():
    jax.config.update("jax_default_matmul_precision", "highest")
    B = int(os.environ.get("QM_MB_BATCH", "256"))
    N = int(os.environ.get("QM_MB_NODES", "67"))
    n = 30
    dtype = jnp.float32
    rng = np.random.default_rng(0)

    from qm_door_tpu.ops.pallas_chol import spd_solve, spd_solve_reference

    W = rng.normal(size=(B, n, n))
    A = jnp.asarray(W @ W.transpose(0, 2, 1) + 2 * np.eye(n), dtype)
    Y = jnp.asarray(rng.normal(size=(B, n, n + 1)), dtype)
    M1 = jnp.asarray(rng.normal(size=(B, n, n)), dtype)
    M2 = jnp.asarray(rng.normal(size=(B, n, n)), dtype)

    print(f"batch={B} nodes={N} device={jax.devices()[0]}", flush=True)

    mm = jax.jit(lambda a, b: a @ b)
    timed("batched matmul (B,30,30)@(B,30,30)", mm, M1, M2)
    mm5 = jax.jit(lambda a, b: a @ b @ b @ a @ b @ a)
    timed("6-chain batched matmul", mm5, M1, M2)

    timed("XLA cho_factor+cho_solve (B,30,30/31)",
          jax.jit(lambda a, y: spd_solve_reference(a, y)), A, Y)
    if os.environ.get("QM_MB_PALLAS", "0") == "1":
        # NOTE: fails to lower on this jax version (scatter-add inside the
        # kernel); kept behind a flag for future toolchains.
        timed("pallas spd_solve (B,30,30/31)",
              jax.jit(lambda a, y: spd_solve(a, y)), A, Y)
        err = float(jnp.max(jnp.abs(spd_solve(A, Y) - spd_solve_reference(A, Y))))
        print(f"{'pallas vs xla max err':>44}: {err:.3e}", flush=True)

    # linear solve via LU for comparison (what parallel-scan riccati uses)
    timed("XLA lu solve (B,30,30/31)",
          jax.jit(lambda a, y: jnp.linalg.solve(a, y)), A, Y)

    # full riccati backward sweep on random stable LQ data
    from qm_door_tpu.solver.transcription import ProjectedLq
    from qm_door_tpu.solver.riccati import riccati_backward

    def spd(k, scale=1.0):
        Wm = rng.normal(size=(B, N, k, k)) * scale
        return jnp.asarray(Wm @ Wm.transpose(0, 1, 3, 2) + 2.0 * np.eye(k), dtype)

    lq = ProjectedLq(
        A=jnp.asarray(np.eye(n) + 0.02 * rng.normal(size=(B, N, n, n)), dtype),
        B=jnp.asarray(0.05 * rng.normal(size=(B, N, n, n)), dtype),
        d=jnp.asarray(0.01 * rng.normal(size=(B, N, n)), dtype),
        lx=jnp.asarray(rng.normal(size=(B, N, n)), dtype),
        lu=jnp.asarray(rng.normal(size=(B, N, n)), dtype),
        lxx=spd(n), luu=spd(n),
        lux=jnp.asarray(0.05 * rng.normal(size=(B, N, n, n)), dtype),
        lx_f=jnp.asarray(rng.normal(size=(B, n)), dtype),
        lxx_f=spd(n)[:, 0],
        p=jnp.zeros((B, N, n), dtype),
        Pu=jnp.zeros((B, N, n, n), dtype),
        Px=jnp.zeros((B, N, n, n), dtype),
    )

    bwd = jax.jit(jax.vmap(lambda l: riccati_backward(l)[0]))
    timed("riccati_backward scan (vmapped, current)", bwd, lq, reps=20)

    # V2: batch-major scan, A/B pre-transposed outside the scan, no .T/einsum
    # transposes inside the step.
    def backward_v2(lq):
        def step(carry, inp):
            S, s = carry
            Am, AmT, Bm, BmT, d, lx, lu, lxx, luu, lux = inp
            Sd_s = jnp.einsum("bij,bj->bi", S, d) + s
            Qx = lx + jnp.einsum("bij,bj->bi", AmT, Sd_s)
            Qu = lu + jnp.einsum("bij,bj->bi", BmT, Sd_s)
            SA = S @ Am
            SB = S @ Bm
            Qxx = lxx + AmT @ SA
            Quu = luu + BmT @ SB
            Qux = lux + BmT @ SA
            Quu = 0.5 * (Quu + jnp.swapaxes(Quu, -1, -2))
            rhs = jnp.concatenate([Qux, Qu[..., None]], axis=-1)

            def one(q, r):
                chol = jax.scipy.linalg.cho_factor(q)
                return jax.scipy.linalg.cho_solve(chol, r)

            sol = -jax.vmap(one)(Quu, rhs)
            K, kff = sol[..., :n], sol[..., n]
            QuxT = jnp.swapaxes(Qux, -1, -2)
            S_new = Qxx + QuxT @ K
            S_new = 0.5 * (S_new + jnp.swapaxes(S_new, -1, -2))
            s_new = Qx + jnp.einsum("bij,bj->bi", QuxT, kff)
            return (S_new, s_new), (K, kff)

        AT = jnp.swapaxes(lq.A, -1, -2)
        BT = jnp.swapaxes(lq.B, -1, -2)
        inputs = jax.tree.map(
            lambda x: jnp.swapaxes(x, 0, 1),
            (lq.A, AT, lq.B, BT, lq.d, lq.lx, lq.lu, lq.lxx, lq.luu, lq.lux))
        (S0, s0), (K, kff) = jax.lax.scan(
            step, (lq.lxx_f, lq.lx_f), inputs, reverse=True)
        return K

    timed("riccati_backward V2 (batch-major, pre-T)",
          jax.jit(backward_v2), lq, reps=20)

    # V3: fused [A|B] assembly — one (B,30,60) chain gives Qxx/Quu/Qux in a
    # single padded-efficient matmul pair; L = [[lxx, lxu],[lux, luu]] packed.
    def backward_v3(lq):
        W = jnp.concatenate([lq.A, lq.B], axis=-1)          # (B,N,30,60)
        WT = jnp.swapaxes(W, -1, -2)                        # (B,N,60,30)
        top = jnp.concatenate([lq.lxx, jnp.swapaxes(lq.lux, -1, -2)], axis=-1)
        bot = jnp.concatenate([lq.lux, lq.luu], axis=-1)
        L = jnp.concatenate([top, bot], axis=-2)            # (B,N,60,60)
        lxu_v = jnp.concatenate([lq.lx, lq.lu], axis=-1)    # (B,N,60)

        def step(carry, inp):
            S, s = carry
            Wk, WTk, Lk, lv, d = inp
            Sd_s = jnp.einsum("bij,bj->bi", S, d) + s
            Qv = lv + jnp.einsum("bij,bj->bi", WTk, Sd_s)   # (B,60)
            Q = Lk + WTk @ (S @ Wk)                         # (B,60,60)
            Qx, Qu = Qv[:, :n], Qv[:, n:]
            Qxx = Q[:, :n, :n]
            Quu = Q[:, n:, n:]
            Qux = Q[:, n:, :n]
            Quu = 0.5 * (Quu + jnp.swapaxes(Quu, -1, -2))
            rhs = jnp.concatenate([Qux, Qu[..., None]], axis=-1)

            def one(q, r):
                chol = jax.scipy.linalg.cho_factor(q)
                return jax.scipy.linalg.cho_solve(chol, r)

            sol = -jax.vmap(one)(Quu, rhs)
            K, kff = sol[..., :n], sol[..., n]
            QuxT = jnp.swapaxes(Qux, -1, -2)
            S_new = Qxx + QuxT @ K
            S_new = 0.5 * (S_new + jnp.swapaxes(S_new, -1, -2))
            s_new = Qx + jnp.einsum("bij,bj->bi", QuxT, kff)
            return (S_new, s_new), (K, kff)

        inputs = jax.tree.map(
            lambda x: jnp.swapaxes(x, 0, 1), (W, WT, L, lxu_v, lq.d))
        (S0, s0), (K, kff) = jax.lax.scan(
            step, (lq.lxx_f, lq.lx_f), inputs, reverse=True)
        return K

    timed("riccati_backward V3 (fused [A|B] 60-dim)",
          jax.jit(backward_v3), lq, reps=20)

    K_ref = bwd(lq)
    for nm, fn in (("V2", backward_v2), ("V3", backward_v3)):
        Kv = jax.jit(fn)(lq)
        kerr = float(jnp.max(jnp.abs(K_ref - jnp.swapaxes(Kv, 0, 1))))
        print(f"{f'riccati K max err ({nm} vs current)':>44}: {kerr:.3e}",
              flush=True)


if __name__ == "__main__":
    main()
