#!/usr/bin/env python
"""Batched WBC throughput on the attached TPU (the reference's 'WBC QP us'
metric: qpOASES solves 3 dense QPs in ~1-2 ms per 500 Hz tick on CPU;
here B ticks solve in parallel).

Usage: QM_WBC_BATCH=512 QM_WBC_MODE=batched python tools/wbc_bench.py
  QM_WBC_MODE: "batched" (batch-major cascade on the Pallas SPD kernel,
  production path), "vmap" (per-robot cascade vmapped, reference path),
  "ft" (42-var force-tracking stack batch-major on the slack-condensed
  Pallas path — the door scenario's per-tick cost), or "ft_vmap" (the
  pre-condensation vmapped ft route, kept for A/B).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    b = int(os.environ.get("QM_WBC_BATCH", "512"))
    reps = int(os.environ.get("QM_WBC_REPS", "20"))
    mode = os.environ.get("QM_WBC_MODE", "batched")

    from qm_door_tpu.config import default_config
    from qm_door_tpu.models import aliengo_z1, centroidal
    from qm_door_tpu.wbc.wbc import WbcState, hierarchical_wbc, hierarchical_wbc_batched

    dtype = jnp.float32
    model = aliengo_z1(dtype=dtype)
    cfg = default_config()
    x0 = jnp.asarray(cfg.initial_state(), dtype=dtype)
    q0 = centroidal.pinocchio_q(x0)
    rbd = centroidal.rbd_from_generalized(model, q0, jnp.zeros(24, dtype=dtype))
    flags = jnp.asarray([1.0, 0.0, 0.0, 1.0], dtype=dtype)
    u_des = centroidal.weight_compensating_input(model, flags)

    rng = np.random.default_rng(0)
    xs = jnp.asarray(np.asarray(x0)[None] + rng.normal(size=(b, 30)) * 0.01, dtype=dtype)
    us = jnp.tile(u_des[None], (b, 1))
    rbds = jnp.tile(rbd[None], (b, 1))
    flagss = jnp.tile(flags[None], (b, 1))

    if mode == "ft":
        # Batch-major 42-var force-tracking cascade (slack-condensed PDIP on
        # the Pallas SPD kernel) — the door scenario's production per-tick
        # path since round 5; "ft_vmap" keeps the pre-condensation route.
        from qm_door_tpu.wbc.force import hierarchical_wbc_ft_batched

        u_ft = jnp.concatenate([u_des, jnp.zeros(6, dtype=dtype)])
        us = jnp.tile(u_ft[None], (b, 1))

        @jax.jit
        def batched_tick(xs, us, rbds, flagss):
            state = WbcState(input_last=jnp.zeros((xs.shape[0], 36), dtype=dtype))
            cmd, _ = hierarchical_wbc_ft_batched(
                model, cfg.wbc, xs, us, rbds, flagss,
                jnp.ones(xs.shape[0], dtype=dtype), state, 0.002,
            )
            return cmd
    elif mode == "ft_vmap":
        from qm_door_tpu.wbc.force import hierarchical_wbc_ft

        u_ft = jnp.concatenate([u_des, jnp.zeros(6, dtype=dtype)])
        us = jnp.tile(u_ft[None], (b, 1))

        @jax.jit
        def batched_tick(xs, us, rbds, flagss):
            def one(x, u, r, f):
                cmd, _ = hierarchical_wbc_ft(
                    model, cfg.wbc, x, u, r, f, jnp.asarray(1.0, dtype=dtype),
                    WbcState.init(dtype=dtype, nu=36), 0.002,
                )
                return cmd

            return jax.vmap(one)(xs, us, rbds, flagss)
    elif mode == "batched":
        @jax.jit
        def batched_tick(xs, us, rbds, flagss):
            state = WbcState(input_last=jnp.zeros((xs.shape[0], 30), dtype=dtype))
            cmd, _ = hierarchical_wbc_batched(
                model, cfg.wbc, xs, us, rbds, flagss, state, 0.002,
                use_arm_init=False,
            )
            return cmd
    else:
        @jax.jit
        def batched_tick(xs, us, rbds, flagss):
            def one(x, u, r, f):
                cmd, _ = hierarchical_wbc(
                    model, cfg.wbc, x, u, r, f, WbcState.init(dtype=dtype), 0.002,
                    use_arm_init=False,
                )
                return cmd

            return jax.vmap(one)(xs, us, rbds, flagss)

    t0 = time.time()
    out = batched_tick(xs, us, rbds, flagss)
    _ = float(out[0, 0])  # scalar device-get: real sync (see docs/PERF.md r5
    # measurement gotcha — identical repeated dispatches + block_until_ready
    # report sub-RTT times through the axon tunnel)
    compile_s = time.time() - t0

    t0 = time.time()
    for _i in range(reps):
        # serial dependence: each rep's input carries the previous output
        xs = xs + 1e-9 * out[:, :30]
        out = batched_tick(xs, us, rbds, flagss)
    _ = float(out[0, 0])
    elapsed = time.time() - t0

    finite = bool(jnp.isfinite(out).all())
    print(json.dumps({
        "metric": "wbc_ticks_per_s",
        "value": round(b * reps / elapsed, 1),
        "unit": "ticks/s",
        "per_tick_us": round(1e6 * elapsed / (b * reps), 2),
        "batch": b,
        "mode": mode,
        "finite": finite,
        "compile_s": round(compile_s, 1),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
