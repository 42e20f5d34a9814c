"""MPC-MRT policy bridge (MPC_MRT_Interface replacement).

The reference runs the SQP in a dedicated 100 Hz thread and swaps the policy
into the 500 Hz control loop under a mutex (QMController.cpp:310-335,
129-142). Here the same roles exist without locks: ``PolicyStore`` is an
immutable pytree snapshot; the control loop holds whichever snapshot it last
received (single-producer/single-consumer by construction), and
``evaluate_policy`` is a pure jittable interpolation.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class PolicyStore:
    """One MPC solution snapshot."""

    times: jnp.ndarray  # (N+1,)
    X: jnp.ndarray      # (N+1, 30)
    U: jnp.ndarray      # (N, 30)


@jax.jit
def evaluate_policy(policy: PolicyStore, t):
    """(x*, u*) at time t — linear state interpolation, piecewise-linear input
    (ocs2 MRT evaluatePolicy semantics), clamped at the horizon ends."""
    times = policy.times
    K = times.shape[0]
    idx = jnp.clip(jnp.searchsorted(times, t, side="right") - 1, 0, K - 2)
    t0, t1 = times[idx], times[idx + 1]
    a = jnp.clip((t - t0) / jnp.maximum(t1 - t0, 1e-9), 0.0, 1.0)
    x = (1 - a) * policy.X[idx] + a * policy.X[idx + 1]

    nu = policy.U.shape[0]
    iu = jnp.clip(idx, 0, nu - 1)
    iu1 = jnp.clip(idx + 1, 0, nu - 1)
    u = (1 - a) * policy.U[iu] + a * policy.U[iu1]
    return x, u
