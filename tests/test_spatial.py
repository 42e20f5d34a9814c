import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qm_door_tpu.models import spatial


def test_zyx_roundtrip(rng):
    zyx = rng.uniform(-1.2, 1.2, size=(16, 3))
    R = spatial.zyx_to_rot(jnp.asarray(zyx))
    back = spatial.rot_to_zyx(R)
    np.testing.assert_allclose(back, zyx, atol=1e-12)


def test_rotation_orthonormal(rng):
    zyx = jnp.asarray(rng.uniform(-3, 3, size=(8, 3)))
    R = spatial.zyx_to_rot(zyx)
    eye = jnp.eye(3)[None].repeat(8, axis=0)
    np.testing.assert_allclose(R @ jnp.swapaxes(R, -1, -2), eye, atol=1e-12)
    np.testing.assert_allclose(np.linalg.det(R), np.ones(8), atol=1e-12)


def test_euler_rate_matrix_vs_rotation_derivative(rng):
    """skew(E(zyx) etadot) == Rdot R^T — the defining property of E."""
    zyx = jnp.asarray(rng.uniform(-1.0, 1.0, size=3))
    rates = jnp.asarray(rng.normal(size=3))
    R, Rdot = jax.jvp(spatial.zyx_to_rot, (zyx,), (rates,))
    omega_mat = Rdot @ R.T
    omega = spatial.zyx_rates_to_world_angvel(zyx, rates)
    np.testing.assert_allclose(omega_mat, spatial.skew(omega), atol=1e-12)


def test_world_angvel_inverse(rng):
    zyx = jnp.asarray(rng.uniform(-1.0, 1.0, size=3))
    w = jnp.asarray(rng.normal(size=3))
    rates = spatial.world_angvel_to_zyx_rates(zyx, w)
    np.testing.assert_allclose(
        spatial.zyx_rates_to_world_angvel(zyx, rates), w, atol=1e-12
    )


def test_quat_rot_roundtrip(rng):
    q = rng.normal(size=(32, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    R = spatial.quat_to_rot(jnp.asarray(q))
    q2 = spatial.rot_to_quat(R)
    # sign ambiguity
    sign = np.sign(np.sum(q * np.asarray(q2), axis=-1, keepdims=True))
    np.testing.assert_allclose(np.asarray(q2) * sign, q, atol=1e-9)


def test_quat_mul_matches_rotation_compose(rng):
    qa = rng.normal(size=4)
    qa /= np.linalg.norm(qa)
    qb = rng.normal(size=4)
    qb /= np.linalg.norm(qb)
    Rab = spatial.quat_to_rot(spatial.quat_mul(jnp.asarray(qa), jnp.asarray(qb)))
    np.testing.assert_allclose(
        Rab, spatial.quat_to_rot(jnp.asarray(qa)) @ spatial.quat_to_rot(jnp.asarray(qb)), atol=1e-12
    )


def test_log3_exp_consistency(rng):
    w = rng.normal(size=3)
    w = w / np.linalg.norm(w) * 0.7
    K = np.asarray(spatial.skew(jnp.asarray(w)))
    from scipy.linalg import expm

    R = expm(K)
    np.testing.assert_allclose(spatial.log3(jnp.asarray(R)), w, atol=1e-9)


def test_slerp_endpoints(rng):
    qa = rng.normal(size=4)
    qa /= np.linalg.norm(qa)
    qb = rng.normal(size=4)
    qb /= np.linalg.norm(qb)
    s0 = spatial.quat_slerp(jnp.asarray(qa), jnp.asarray(qb), 0.0)
    s1 = spatial.quat_slerp(jnp.asarray(qa), jnp.asarray(qb), 1.0)
    np.testing.assert_allclose(np.abs(np.dot(s0, qa)), 1.0, atol=1e-9)
    np.testing.assert_allclose(np.abs(np.dot(s1, qb)), 1.0, atol=1e-9)


def test_rotation_error_world_zero_and_direction():
    Ra = spatial.zyx_to_rot(jnp.asarray([0.3, -0.2, 0.1]))
    np.testing.assert_allclose(
        spatial.rotation_error_world(Ra, Ra), np.zeros(3), atol=1e-12
    )
    # small world-frame rotation delta about z
    eps = 1e-4
    Rb = spatial.rot_z(jnp.asarray(eps)) @ Ra
    err = spatial.rotation_error_world(Rb, Ra)
    np.testing.assert_allclose(err, [0, 0, eps], atol=1e-8)


def test_inv3_and_solve6_block(rng):
    """Elementwise 3x3 adjugate inverse and 6x6 block-Schur solve match
    jnp.linalg on well-conditioned matrices (incl. batched shapes) — the
    fusable replacement for the CMM base-block solve on the TPU hot path."""
    M = rng.normal(size=(5, 3, 3)) + 3.0 * np.eye(3)
    got = spatial.inv3(jnp.asarray(M))
    np.testing.assert_allclose(
        np.asarray(got), np.linalg.inv(M), rtol=1e-10, atol=1e-12
    )

    A = rng.normal(size=(7, 6, 6)) + 5.0 * np.eye(6)
    rhs_m = rng.normal(size=(7, 6, 4))
    rhs_v = rng.normal(size=(7, 6))
    got_m = spatial.solve6_block(jnp.asarray(A), jnp.asarray(rhs_m))
    got_v = spatial.solve6_block(jnp.asarray(A), jnp.asarray(rhs_v))
    np.testing.assert_allclose(
        np.asarray(got_m), np.linalg.solve(A, rhs_m), rtol=1e-9, atol=1e-11
    )
    np.testing.assert_allclose(
        np.asarray(got_v), np.linalg.solve(A, rhs_v[..., None])[..., 0],
        rtol=1e-9, atol=1e-11,
    )
