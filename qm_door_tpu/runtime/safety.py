"""Safety checker (qm_controllers SafetyChecker.h:25-32 equivalent):
stop the controller when base roll/pitch leaves +-pi/2."""
from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.jit
def safety_check(x_obs, limit=jnp.pi / 2):
    """True = safe. x_obs is the 30-dim centroidal observation; base euler
    zyx sits at [9:12] = (yaw, pitch, roll)."""
    pitch = x_obs[10]
    roll = x_obs[11]
    return (jnp.abs(pitch) < limit) & (jnp.abs(roll) < limit)
