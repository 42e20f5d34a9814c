import jax
import jax.numpy as jnp
import numpy as np

from qm_door_tpu.models import dynamics, centroidal, kinematics
from qm_door_tpu.models.model import GRAVITY


def _rand_state(rng, vel=1.0):
    q = np.concatenate(
        [
            rng.normal(size=3) * 0.5,
            rng.uniform(-0.7, 0.7, size=3),
            rng.uniform(-1.0, 1.0, size=18),
        ]
    )
    v = rng.normal(size=24) * vel
    return jnp.asarray(q), jnp.asarray(v)


def test_mass_matrix_spd(model, rng):
    q, _ = _rand_state(rng)
    M = dynamics.mass_matrix(model, q)
    np.testing.assert_allclose(M, M.T, atol=1e-10)
    eig = np.linalg.eigvalsh(np.asarray(M))
    assert eig.min() > 1e-8


def test_mass_matrix_translation_block(model, rng):
    """Base-translation block must be total-mass * I (world-chart property)."""
    q, _ = _rand_state(rng)
    M = dynamics.mass_matrix(model, q)
    m_tot = float(jnp.sum(model.body_mass))
    np.testing.assert_allclose(M[:3, :3], m_tot * np.eye(3), atol=1e-9)


def test_gravity_vector(model, rng):
    q, _ = _rand_state(rng)
    g = dynamics.gravity_vector(model, q)
    m_tot = float(jnp.sum(model.body_mass))
    # d V / d base-z = m g ; x/y translations don't change potential
    np.testing.assert_allclose(g[0:3], [0.0, 0.0, m_tot * GRAVITY], atol=1e-9)


def test_nle_zero_velocity_is_gravity(model, rng):
    q, _ = _rand_state(rng)
    h = dynamics.nonlinear_effects(model, q, jnp.zeros(24))
    np.testing.assert_allclose(h, dynamics.gravity_vector(model, q), atol=1e-9)


def test_coriolis_power_identity(model, rng):
    """v^T (h - g) = 1/2 v^T Mdot v  (passivity: Mdot - 2C skew-symmetric)."""
    q, v = _rand_state(rng)
    h = dynamics.nonlinear_effects(model, q, v)
    g = dynamics.gravity_vector(model, q)
    _, Mdot = jax.jvp(lambda qq: dynamics.mass_matrix(model, qq), (q,), (v,))
    np.testing.assert_allclose(v @ (h - g), 0.5 * v @ Mdot @ v, atol=1e-8)


def test_energy_conservation_free_fall(model, rng):
    """Unactuated RK4 rollout conserves total energy to integrator order."""
    q, v = _rand_state(rng, vel=0.5)

    def xdot(state):
        qq, vv = state[:24], state[24:]
        a = dynamics.forward_dynamics(model, qq, vv, jnp.zeros(24))
        return jnp.concatenate([vv, a])

    def rk4(state, dt):
        k1 = xdot(state)
        k2 = xdot(state + 0.5 * dt * k1)
        k3 = xdot(state + 0.5 * dt * k2)
        k4 = xdot(state + dt * k3)
        return state + dt / 6 * (k1 + 2 * k2 + 2 * k3 + k4)

    def energy(state):
        qq, vv = state[:24], state[24:]
        return dynamics.kinetic_energy(model, qq, vv) + dynamics.potential_energy(model, qq)

    s = jnp.concatenate([q, v])
    e0 = float(energy(s))
    dt = 1e-3
    for _ in range(20):
        s = rk4(s, dt)
    e1 = float(energy(s))
    assert abs(e1 - e0) < 1e-6 * max(1.0, abs(e0))


def test_cmm_linear_block(model, rng):
    """A[:, :3] = m I and A_ang[:, :3] = 0 (momentum about the com)."""
    q, _ = _rand_state(rng)
    A = dynamics.centroidal_momentum_matrix(model, q)
    m_tot = float(jnp.sum(model.body_mass))
    np.testing.assert_allclose(A[:3, :3], m_tot * np.eye(3), atol=1e-9)
    np.testing.assert_allclose(A[3:, :3], np.zeros((3, 3)), atol=1e-9)


def test_cmm_linear_momentum_vs_com_velocity(model, rng):
    q, v = _rand_state(rng)
    h = dynamics.centroidal_momentum(model, q, v)
    _, comdot = jax.jvp(lambda qq: dynamics.com_position(model, qq), (q,), (v,))
    m_tot = float(jnp.sum(model.body_mass))
    np.testing.assert_allclose(h[:3], m_tot * comdot, atol=1e-9)


def test_cmm_dot_vs_fd(model, rng):
    q, v = _rand_state(rng)
    Adot = dynamics.centroidal_momentum_matrix_dot(model, q, v)
    eps = 1e-6
    Ap = dynamics.centroidal_momentum_matrix(model, q + eps * v)
    Am = dynamics.centroidal_momentum_matrix(model, q - eps * v)
    np.testing.assert_allclose(Adot, (Ap - Am) / (2 * eps), atol=1e-6)


def test_newton_euler_free_fall_momentum_rate(model, rng):
    """d/dt (A v) = [m g ; 0] in unactuated free fall — couples M, h, A, Adot."""
    q, v = _rand_state(rng, vel=0.5)
    a = dynamics.forward_dynamics(model, q, v, jnp.zeros(24))
    A = dynamics.centroidal_momentum_matrix(model, q)
    Adot = dynamics.centroidal_momentum_matrix_dot(model, q, v)
    hdot = Adot @ v + A @ a
    m_tot = float(jnp.sum(model.body_mass))
    np.testing.assert_allclose(
        hdot, np.array([0.0, 0.0, -m_tot * GRAVITY, 0.0, 0.0, 0.0]), atol=1e-7
    )


def test_contact_force_momentum_rate(model, rng):
    """With a single foot force F: d/dt(Av) = [F + mg; (p_f - com) x F].

    Full Newton-Euler consistency between the whole-body EoM and the
    centroidal flow map used by the MPC.
    """
    q, v = _rand_state(rng, vel=0.3)
    F = jnp.asarray(rng.normal(size=3) * 50)
    foot = model.contact_frame_ids[0]
    J = kinematics.frame_jacobians(model, q, (foot,))[0, :3, :]
    tau = J.T @ F
    a = dynamics.forward_dynamics(model, q, v, tau)
    A = dynamics.centroidal_momentum_matrix(model, q)
    Adot = dynamics.centroidal_momentum_matrix_dot(model, q, v)
    hdot = Adot @ v + A @ a

    p_f = kinematics.contact_positions(model, q)[0]
    com = dynamics.com_position(model, q)
    m_tot = float(jnp.sum(model.body_mass))
    expect = np.concatenate(
        [np.asarray(F) + [0, 0, -m_tot * GRAVITY], np.cross(np.asarray(p_f - com), np.asarray(F))]
    )
    np.testing.assert_allclose(hdot, expect, atol=1e-6)
