import jax
import jax.numpy as jnp
import numpy as np

from qm_door_tpu.models import centroidal, dynamics
from qm_door_tpu.models.model import GRAVITY


def _rand_qv(rng):
    q = np.concatenate(
        [rng.normal(size=3) * 0.3, rng.uniform(-0.6, 0.6, size=3), rng.uniform(-1, 1, size=18)]
    )
    v = rng.normal(size=24)
    return jnp.asarray(q), jnp.asarray(v)


def _state_from_qv(model, q, v):
    m = jnp.sum(model.body_mass)
    h_norm = dynamics.centroidal_momentum(model, q, v) / m
    return jnp.concatenate([h_norm, q])


def test_base_velocity_roundtrip(model, rng):
    """x built from (q, v) must map back to the same base velocity."""
    q, v = _rand_qv(rng)
    x = _state_from_qv(model, q, v)
    u = jnp.concatenate([jnp.zeros(12), v[6:]])
    vb = centroidal.base_velocity(model, x, u)
    np.testing.assert_allclose(vb, v[:6], atol=1e-9)
    np.testing.assert_allclose(centroidal.pinocchio_v(model, x, u), v, atol=1e-9)


def test_flow_map_gravity_only(model, rng):
    q, v = _rand_qv(rng)
    x = _state_from_qv(model, q, v)
    u = jnp.concatenate([jnp.zeros(12), v[6:]])
    xdot = centroidal.flow_map(model, x, u)
    np.testing.assert_allclose(xdot[0:6], [0, 0, -GRAVITY, 0, 0, 0], atol=1e-9)
    np.testing.assert_allclose(xdot[6:12], v[:6], atol=1e-9)
    np.testing.assert_allclose(xdot[12:], v[6:], atol=1e-12)


def test_flow_map_matches_full_dynamics(model, rng):
    """The centroidal flow map's momentum rate equals the full-model momentum
    rate under the same contact forces (Newton-Euler consistency)."""
    from qm_door_tpu.models import kinematics

    q, v = _rand_qv(rng)
    x = _state_from_qv(model, q, v)
    forces = rng.normal(size=(4, 3)) * 40
    u = jnp.concatenate([jnp.asarray(forces).reshape(-1), v[6:]])
    xdot = centroidal.flow_map(model, x, u)

    m = float(jnp.sum(model.body_mass))
    p_c = kinematics.contact_positions(model, q)
    com = dynamics.com_position(model, q)
    lin = forces.sum(0) / m + np.array([0, 0, -GRAVITY])
    ang = np.cross(np.asarray(p_c - com), forces).sum(0) / m
    np.testing.assert_allclose(xdot[0:3], lin, atol=1e-9)
    np.testing.assert_allclose(xdot[3:6], ang, atol=1e-9)


def test_weight_compensating_input(model):
    u = centroidal.weight_compensating_input(model, jnp.array([1.0, 1.0, 1.0, 1.0]))
    m = float(jnp.sum(model.body_mass))
    F = np.asarray(centroidal.contact_forces(u))
    np.testing.assert_allclose(F[:, 2], np.full(4, m * GRAVITY / 4), rtol=1e-12)
    np.testing.assert_allclose(F[:, :2], 0, atol=1e-12)
    u2 = centroidal.weight_compensating_input(model, jnp.array([1.0, 0.0, 0.0, 1.0]))
    F2 = np.asarray(centroidal.contact_forces(u2))
    np.testing.assert_allclose(F2[[0, 3], 2], np.full(2, m * GRAVITY / 2), rtol=1e-12)
    np.testing.assert_allclose(F2[[1, 2]], 0, atol=1e-12)


def test_rbd_roundtrip(model, rng):
    q, v = _rand_qv(rng)
    rbd = centroidal.rbd_from_generalized(model, q, v)
    q2, v2 = centroidal.rbd_to_generalized(rbd)
    np.testing.assert_allclose(q2, q, atol=1e-10)
    np.testing.assert_allclose(v2, v, atol=1e-10)
    x = centroidal.centroidal_state_from_rbd(model, rbd)
    np.testing.assert_allclose(x, _state_from_qv(model, q, v), atol=1e-9)


def test_flow_map_linearization_shapes_and_fd(model, rng):
    q, v = _rand_qv(rng)
    x = _state_from_qv(model, q, v)
    u = jnp.concatenate([jnp.asarray(rng.normal(size=12)) * 30, v[6:]])
    f, A, B = centroidal.flow_map_linearization(model, x, u)
    assert A.shape == (30, 30) and B.shape == (30, 30)
    eps = 1e-6
    dx = jnp.asarray(rng.normal(size=30))
    fd = (centroidal.flow_map(model, x + eps * dx, u) - centroidal.flow_map(model, x - eps * dx, u)) / (2 * eps)
    np.testing.assert_allclose(A @ dx, fd, atol=1e-5)
    du = jnp.asarray(rng.normal(size=30))
    fdu = (centroidal.flow_map(model, x, u + eps * du) - centroidal.flow_map(model, x, u - eps * du)) / (2 * eps)
    np.testing.assert_allclose(B @ du, fdu, atol=1e-5)
