import jax
import jax.numpy as jnp
import numpy as np

from qm_door_tpu.models import kinematics, spatial


def _rand_state(rng):
    q = np.concatenate(
        [
            rng.normal(size=3) * 0.5,
            rng.uniform(-0.8, 0.8, size=3),
            rng.uniform(-1.0, 1.0, size=18),
        ]
    )
    v = rng.normal(size=24)
    return jnp.asarray(q), jnp.asarray(v)


def test_fk_neutral_base_offset(model):
    """Moving the base translates every frame rigidly."""
    q0 = jnp.zeros(24)
    q1 = q0.at[0:3].set(jnp.asarray([1.0, -2.0, 0.5]))
    _, p0 = kinematics.frame_placements(model, q0)
    _, p1 = kinematics.frame_placements(model, q1)
    np.testing.assert_allclose(p1 - p0, np.tile([1.0, -2.0, 0.5], (len(model.frame_names), 1)), atol=1e-12)


def test_fk_feet_symmetry(model):
    """LF/RF and LH/RH feet mirror across y at neutral configuration."""
    q = jnp.zeros(24)
    q = q.at[12 + 1 - 12 + 13].set(0.0)  # no-op; keep neutral
    _, p = kinematics.frame_placements(model, q)
    feet = {model.frame_names[i]: np.asarray(p[i]) for i in model.contact_frame_ids}
    np.testing.assert_allclose(feet["LF_FOOT"][0], feet["RF_FOOT"][0], atol=1e-9)
    np.testing.assert_allclose(feet["LF_FOOT"][1], -feet["RF_FOOT"][1], atol=1e-9)
    np.testing.assert_allclose(feet["LH_FOOT"][2], feet["RH_FOOT"][2], atol=1e-9)


def test_frame_jacobian_linear_vs_fd(model, rng):
    q, v = _rand_state(rng)
    J = kinematics.frame_jacobians(model, q)
    # In this chart qdot == v, so the linear rows are d p / d q directly.
    def pos(qq):
        return kinematics.frame_placements(model, qq)[1]

    Jfd = jax.jacfwd(pos)(q)  # (F,3,24)
    np.testing.assert_allclose(J[:, :3, :], Jfd, atol=1e-10)


def test_frame_jacobian_angular_vs_rotation_derivative(model, rng):
    q, v = _rand_state(rng)
    J = kinematics.frame_jacobians(model, q)

    def rots(qq):
        return kinematics.frame_placements(model, qq)[0]

    R, Rdot = jax.jvp(rots, (q,), (v,))
    omega_from_R = np.stack(
        [np.asarray(Rdot[i] @ R[i].T) for i in range(len(model.frame_names))]
    )
    omega_from_J = np.asarray(J[:, 3:, :] @ v)
    for i in range(len(model.frame_names)):
        np.testing.assert_allclose(
            omega_from_R[i], np.asarray(spatial.skew(jnp.asarray(omega_from_J[i]))), atol=1e-9
        )


def test_frame_jacobian_dot_vs_fd(model, rng):
    q, v = _rand_state(rng)
    Jdot = kinematics.frame_jacobians_dot(model, q, v)
    eps = 1e-6
    Jp = kinematics.frame_jacobians(model, q + eps * v)
    Jm = kinematics.frame_jacobians(model, q - eps * v)
    np.testing.assert_allclose(Jdot, (Jp - Jm) / (2 * eps), atol=1e-6)


def test_point_velocity_consistency(model, rng):
    """J v equals d/dt of frame position along the trajectory."""
    q, v = _rand_state(rng)
    vel = kinematics.frame_velocities(model, q, v)

    def pos(qq):
        return kinematics.frame_placements(model, qq)[1]

    _, pdot = jax.jvp(pos, (q,), (v,))
    np.testing.assert_allclose(vel[:, :3], pdot, atol=1e-10)


def test_vmap_batching(model, rng):
    qs = jnp.asarray(rng.normal(size=(5, 24)) * 0.3)
    batched = jax.vmap(lambda q: kinematics.contact_positions(model, q))(qs)
    single = jnp.stack([kinematics.contact_positions(model, qs[i]) for i in range(5)])
    np.testing.assert_allclose(batched, single, atol=1e-12)
