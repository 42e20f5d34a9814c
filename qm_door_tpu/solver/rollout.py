"""Nonlinear rollout integrators (TimeTriggeredRollout / ODE45 role).

The reference forward-simulates the centroidal flow map with an adaptive
RK45 integrator for MRT policy rollouts (qm_interface/src/QMInterface.cpp:137,
task.info rollout settings). TPU-native: fixed-step RK4 over a lax.scan
(static step count) and a fixed-iteration embedded RK45 with per-step error
estimates reported for diagnostics (adaptive step rejection is replaced by a
conservative fixed step — data-dependent step counts don't jit).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..models import centroidal
from ..models.model import RobotModel


def rk4_step(model: RobotModel, x, u, dt):
    f = partial(centroidal.flow_map, model)
    k1 = f(x, u)
    k2 = f(x + 0.5 * dt * k1, u)
    k3 = f(x + 0.5 * dt * k2, u)
    k4 = f(x + dt * k3, u)
    return x + dt / 6.0 * (k1 + 2 * k2 + 2 * k3 + k4)


def rk45_step(model: RobotModel, x, u, dt):
    """One Dormand-Prince step; returns (x5, error_estimate_norm)."""
    f = partial(centroidal.flow_map, model)
    k1 = f(x, u)
    k2 = f(x + dt * (1 / 5) * k1, u)
    k3 = f(x + dt * (3 / 40 * k1 + 9 / 40 * k2), u)
    k4 = f(x + dt * (44 / 45 * k1 - 56 / 15 * k2 + 32 / 9 * k3), u)
    k5 = f(
        x + dt * (19372 / 6561 * k1 - 25360 / 2187 * k2 + 64448 / 6561 * k3 - 212 / 729 * k4),
        u,
    )
    k6 = f(
        x
        + dt
        * (9017 / 3168 * k1 - 355 / 33 * k2 + 46732 / 5247 * k3 + 49 / 176 * k4 - 5103 / 18656 * k5),
        u,
    )
    x5 = x + dt * (35 / 384 * k1 + 500 / 1113 * k3 + 125 / 192 * k4 - 2187 / 6784 * k5 + 11 / 84 * k6)
    k7 = f(x5, u)
    x4 = x + dt * (
        5179 / 57600 * k1 + 7571 / 16695 * k3 + 393 / 640 * k4
        - 92097 / 339200 * k5 + 187 / 2100 * k6 + 1 / 40 * k7
    )
    return x5, jnp.linalg.norm(x5 - x4)


@partial(jax.jit, static_argnames=("substeps", "method"))
def rollout(model: RobotModel, x0, U, dt, substeps: int = 1, method: str = "rk4"):
    """Integrate x through the input sequence U (N, 30) with N*substeps steps.

    Returns X (N+1, 30). Piecewise-constant input per interval (matching the
    reference's zero-order-hold rollout).
    """
    h = dt / substeps
    step = rk4_step if method == "rk4" else lambda m, x, u, hh: rk45_step(m, x, u, hh)[0]

    def interval(x, u):
        def sub(xc, _):
            return step(model, xc, u, h), None

        x_next, _ = jax.lax.scan(sub, x, None, length=substeps)
        return x_next, x_next

    _, X_tail = jax.lax.scan(interval, x0, U)
    return jnp.concatenate([x0[None], X_tail], axis=0)
