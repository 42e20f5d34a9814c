#!/usr/bin/env python
"""Timing + f32 correctness of the lanes-last Pallas LQ kernels on the TPU.

Compares project+backward+forward against the XLA reference path on random LQ
data at production shapes (N=67, batch configurable) and times both.

Usage: QM_PROF_BATCH=256 python tools/profile_pallas_lq.py
"""
import os
import sys
import time
import types

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    jax.config.update("jax_default_matmul_precision", "highest")
    b = int(os.environ.get("QM_PROF_BATCH", "256"))
    n = int(os.environ.get("QM_PROF_NODES", "67"))
    bt = int(os.environ.get("QM_PROF_BT", "128"))
    dtype = jnp.float32

    from qm_door_tpu.ocp import constraints as cons
    from qm_door_tpu.ops import pallas_lq as pk
    from qm_door_tpu.solver.riccati import lqr_solve
    from qm_door_tpu.solver.transcription import LqProblem, project_ocp

    rng = np.random.default_rng(0)

    def spd(shape_n, scale=1.0):
        W = rng.normal(size=(b, n, shape_n, shape_n)) * scale
        return jnp.asarray(W @ W.transpose(0, 1, 3, 2) + 2.0 * np.eye(shape_n), dtype)

    flags = jnp.asarray(rng.integers(0, 2, size=(b, n, 4)), dtype)
    act = cons.velocity_row_mask(flags)
    lq = LqProblem(
        A=jnp.asarray(np.eye(30) + 0.02 * rng.normal(size=(b, n, 30, 30)), dtype),
        B=jnp.asarray(0.05 * rng.normal(size=(b, n, 30, 30)), dtype),
        d=jnp.asarray(0.01 * rng.normal(size=(b, n, 30)), dtype),
        lx=jnp.asarray(rng.normal(size=(b, n, 30)), dtype),
        lu=jnp.asarray(rng.normal(size=(b, n, 30)), dtype),
        lxx=spd(30), luu=spd(30),
        lux=jnp.asarray(0.05 * rng.normal(size=(b, n, 30, 30)), dtype),
        cost=jnp.zeros((b,), dtype),
        g0=jnp.asarray(rng.normal(size=(b, n, 12)), dtype) * act,
        Gx=jnp.asarray(rng.normal(size=(b, n, 12, 30)), dtype) * act[..., None],
        Gv=jnp.asarray(rng.normal(size=(b, n, 12, 18)), dtype) * act[..., None],
        lx_f=jnp.asarray(rng.normal(size=(b, 30)), dtype),
        lxx_f=spd(30)[:, 0],
    )
    U = jnp.asarray(rng.normal(size=(b, n, 30)), dtype)
    dx0 = jnp.asarray(0.1 * rng.normal(size=(b, 30)), dtype)
    fm = jnp.repeat(flags, 3, axis=-1)
    F_bar = U[:, :, :12]

    pallas_fn = jax.jit(lambda lq_, a_, f_, Fb_, d0_: pk.solve_lq_batched(
        lq_, a_, f_, Fb_, d0_, shift=1e-5, batch_tile=bt))

    def ref_fn(lq_, flags_, U_, dx0_):
        def one(l, f, u, d0):
            stage = types.SimpleNamespace(contact_flags=f)
            plq = project_ocp(l, stage, u, shift=1e-5, method="chol")
            dX, dU, _, _ = lqr_solve(plq, d0)
            return dX, dU
        return jax.vmap(one)(lq_, flags_, U_, dx0_)

    ref_jit = jax.jit(ref_fn)

    def timed(name, fn, *args, reps=20):
        t0 = time.time()
        out = fn(*args)
        jax.block_until_ready(out)
        print(f"{name:>16}: compile+1 {time.time()-t0:.1f}s", flush=True)
        # forced host fetch per rep: block_until_ready alone has been seen
        # returning early through the axon tunnel for pallas outputs
        t0 = time.time()
        acc = 0.0
        for _ in range(reps):
            out = fn(*args)
            acc += float(out[0][0, 0, 0])
        ms = 1e3 * (time.time() - t0) / reps
        print(f"{name:>16}: {ms:9.2f} ms/step  ({1e3*ms/b:8.1f} us/solve)  [acc={acc:.3e}]", flush=True)
        return out

    print(f"batch={b} nodes={n} bt={bt} device={jax.devices()[0]}", flush=True)
    dXp, dUp = timed("pallas lq", pallas_fn, lq, act, fm, F_bar, dx0)
    if os.environ.get("QM_PROF_SKIP_REF", "0") != "1":
        dXr, dUr = timed("xla reference", ref_jit, lq, flags, U, dx0)
        ex = float(jnp.max(jnp.abs(dXp - dXr)))
        eu = float(jnp.max(jnp.abs(dUp - dUr)))
        sx = float(jnp.max(jnp.abs(dXr)))
        print(f"max|dX diff| = {ex:.3e} (scale {sx:.2e}), max|dU diff| = {eu:.3e}")


if __name__ == "__main__":
    main()
