"""Closed-loop terrain locomotion golden (BASELINE config #3): trot up a
staircase with terrain-aware swing references (the ocs2 SwingTrajectoryPlanner
per-foot liftoff/touchdown heights, task.info:24-31) and a terrain-following
base height target."""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))


@pytest.mark.slow
def test_stairs_ascent_two_seconds():
    import jax.numpy as jnp

    from qm_door_tpu.sim import terrain
    from stairs_diag import run_stairs

    log, params = run_stairs(duration=3.0, v=0.3, rise=0.06)
    assert log.safe
    base = np.stack(log.base_pose)

    # walked forward onto the stairs (0.3 m/s commanded for 3 s)
    assert base[-1, 0] > 0.6, base[-1, 0]
    # climbed at least one full tread
    climb = base[-1, 2] - base[0, 2]
    zt_end = float(terrain.terrain_height(
        "stairs", jnp.asarray(base[-1, 0]), jnp.asarray(0.0), params))
    assert zt_end >= 0.12, zt_end          # reached the second step
    assert climb > 0.8 * zt_end, (climb, zt_end)
    # base height tracks the terrain: height above local ground stays near
    # the nominal 0.37 m the whole way up
    for i in range(0, len(base), 25):
        zt = float(terrain.terrain_height(
            "stairs", jnp.asarray(base[i, 0]), jnp.asarray(0.0), params))
        h = base[i, 2] - zt
        assert 0.25 < h < 0.50, (i, h)
    # attitude bounded while climbing
    assert np.abs(base[:, 4:6]).max() < 0.25
    # MPC stays feasible through the climb (transients at step edges are
    # expected; it must recover, not ratchet)
    assert log.mpc_viol[-1] < 1.0
    assert max(log.mpc_viol) < 50.0
