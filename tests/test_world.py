"""Lateral-collision worlds (sim/world.py): mesh loading, the point-vs-
triangle contact law, and walls actually stopping the robot in sim
(qm_description/urdf/{mazes,tunnel,vchimney} parity)."""
import jax.numpy as jnp
import numpy as np
import pytest

from qm_door_tpu.sim.world import (
    WorldMesh,
    load_world,
    sphere_mesh_force,
    world_generalized_forces,
    world_names,
)


def _square_wall():
    """Unit square wall in the y-z plane at x = 0 (two triangles)."""
    v = np.array([
        [0.0, -1.0, -1.0], [0.0, 1.0, -1.0], [0.0, 1.0, 1.0],
        [0.0, -1.0, -1.0], [0.0, 1.0, 1.0], [0.0, -1.0, 1.0],
    ])
    tris = v.reshape(2, 3, 3)
    v0, e1, e2 = tris[:, 0], tris[:, 1] - tris[:, 0], tris[:, 2] - tris[:, 0]
    n = np.cross(e1, e2)
    n = n / np.linalg.norm(n, axis=-1, keepdims=True)
    return WorldMesh(v0=jnp.asarray(v0), e1=jnp.asarray(e1),
                     e2=jnp.asarray(e2), n=jnp.asarray(n))


def test_sphere_wall_force_direction_and_magnitude():
    mesh = _square_wall()
    k, c = 1000.0, 10.0
    # sphere overlapping from +x, moving into the wall
    F = sphere_mesh_force(mesh, jnp.array([0.05, 0.0, 0.0]),
                          jnp.array([-1.0, 0.0, 0.0]), 0.1, k, c)
    F = np.asarray(F)
    assert F[0] > 0.0 and abs(F[1]) < 1e-9
    # one square = two coplanar triangles, the center point hits both:
    # per-triangle fn = k * 0.05 + c * 1.0
    assert F[0] == pytest.approx(2 * (k * 0.05 + c * 1.0), rel=1e-6)
    # mirrored sphere gets the mirrored force (two-sided wall)
    F2 = np.asarray(sphere_mesh_force(mesh, jnp.array([-0.05, 0.0, 0.0]),
                                      jnp.array([1.0, 0.0, 0.0]), 0.1, k, c))
    assert F2[0] == pytest.approx(-F[0], rel=1e-6)
    # no force when clear of the wall or past the face boundary
    for p in ([0.5, 0.0, 0.0], [0.05, 1.5, 0.0], [0.05, 0.0, -1.5]):
        F3 = np.asarray(sphere_mesh_force(mesh, jnp.array(p),
                                          jnp.zeros(3), 0.1, k, c))
        assert np.abs(F3).max() < 1e-9, p
    # receding normal velocity never sticks (normal force floored at 0)
    F4 = np.asarray(sphere_mesh_force(mesh, jnp.array([0.05, 0.0, 0.0]),
                                      jnp.array([100.0, 0.0, 0.0]), 0.1, k, c))
    assert F4[0] >= 0.0


def test_friction_coulomb_clamp():
    mesh = _square_wall()
    k, c, mu = 1000.0, 0.0, 0.7
    # sliding along the wall: |ft| <= mu * fn
    F = np.asarray(sphere_mesh_force(mesh, jnp.array([0.05, 0.0, 0.0]),
                                     jnp.array([0.0, 5.0, 0.0]), 0.1, k, c,
                                     mu=mu))
    fn = F[0]
    ft = np.linalg.norm(F[1:])
    assert fn > 0.0
    assert ft <= mu * fn + 1e-6
    assert F[1] < 0.0  # opposes sliding


def test_all_reference_worlds_load():
    names = world_names()
    for want in ("maze1", "maze4", "tunnel30", "tunnel60", "vchimney"):
        assert want in names
    for name in names:
        mesh = load_world(name)
        assert mesh.v0.shape[0] >= 12
        nrm = np.linalg.norm(np.asarray(mesh.n), axis=-1)
        np.testing.assert_allclose(nrm, 1.0, atol=1e-6)


def test_trunk_wall_generalized_force(model):
    from qm_door_tpu.config import default_config
    from qm_door_tpu.models import centroidal

    cfg = default_config()
    x0 = jnp.asarray(cfg.initial_state())
    q = centroidal.pinocchio_q(x0)
    v = jnp.zeros(24, dtype=q.dtype)
    # tunnel60 (interior 1.0 x 0.66 m) centered on the robot:
    # side walls at x ~ +-0.50, back wall inner face at y ~ +0.33
    mesh = load_world("tunnel60", (0.0, -0.33, 0.0))
    tau0 = np.asarray(world_generalized_forces(model, mesh, q, v))
    assert np.abs(tau0).max() < 1e-6  # centered robot is clear of the walls
    # shoved 10 cm toward the right wall: the trunk sphere engages and the
    # generalized force pushes back in -x
    q_shift = q.at[0].add(0.10)
    tau1 = np.asarray(world_generalized_forces(model, mesh, q_shift, v))
    assert tau1[0] < -1.0


@pytest.mark.slow
def test_wall_stops_lateral_push(model):
    """300 N lateral shove in tunnel60: without walls the robot slides out
    of the passage; with walls it is stopped at the trunk-sphere contact."""
    from qm_door_tpu.config import default_config
    from qm_door_tpu.models import centroidal, kinematics
    from qm_door_tpu.sim.sim import SimConfig, sim_init, sim_step

    cfg = default_config()
    x0 = np.asarray(cfg.initial_state())
    q0 = jnp.asarray(x0[6:30])
    feet_z = float(jnp.mean(kinematics.contact_positions(model, q0)[:, 2]))
    q0 = q0.at[2].add(-feet_z)
    cmd = jnp.stack([q0[6:24], jnp.zeros(18), jnp.full(18, 300.0),
                     jnp.full(18, 8.0), jnp.zeros(18)])
    wrench = jnp.array([300.0, 0.0, 0.0, 0.0, 0.0, 0.0])

    finals = {}
    for world in ("none", "tunnel60"):
        sc = SimConfig(world=world, world_offset=(0.0, -0.33, 0.0))
        st = sim_init(model, q0, cfg=sc)
        for _ in range(500):
            st = sim_step(model, sc, st, cmd, external_wrench=wrench)
        assert bool(jnp.isfinite(st.q).all())
        finals[world] = float(st.q[0])
    assert finals["tunnel60"] < finals["none"] - 0.05
    # trunk sphere (front corner x 0.33 + r 0.12) against the wall at 0.50:
    # base stays within the passage
    assert finals["tunnel60"] < 0.15
