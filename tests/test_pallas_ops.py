"""Pallas kernels validated in interpreter mode on CPU (compiled mode is
exercised on the TPU by bench/profiling tools)."""
import jax.numpy as jnp
import numpy as np

from qm_door_tpu.ops.pallas_chol import spd_solve, spd_solve_reference


def _spd_batch(rng, B, n):
    A = rng.normal(size=(B, n, n))
    A = A @ np.swapaxes(A, -1, -2) + n * np.eye(n)
    return jnp.asarray(A)


def test_spd_solve_matches_reference(rng):
    B, n, m = 8, 30, 4
    A = _spd_batch(rng, B, n)
    Y = jnp.asarray(rng.normal(size=(B, n, m)))
    X = spd_solve(A, Y, interpret=True)
    X_ref = spd_solve_reference(A, Y)
    np.testing.assert_allclose(np.asarray(X), np.asarray(X_ref), rtol=1e-8, atol=1e-8)


def test_spd_solve_residual(rng):
    B, n, m = 4, 26, 26
    A = _spd_batch(rng, B, n)
    Y = jnp.asarray(rng.normal(size=(B, n, m)))
    X = spd_solve(A, Y, interpret=True)
    resid = np.einsum("bij,bjk->bik", np.asarray(A), np.asarray(X)) - np.asarray(Y)
    assert np.abs(resid).max() < 1e-7


def test_spd_solve_nondivisible_batch(rng):
    B, n, m = 5, 12, 1
    A = _spd_batch(rng, B, n)
    Y = jnp.asarray(rng.normal(size=(B, n, m)))
    X = spd_solve(A, Y, interpret=True)
    X_ref = spd_solve_reference(A, Y)
    np.testing.assert_allclose(np.asarray(X), np.asarray(X_ref), rtol=1e-8, atol=1e-8)
