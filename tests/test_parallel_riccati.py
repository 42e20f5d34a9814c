import jax
import jax.numpy as jnp
import numpy as np

from qm_door_tpu.solver.riccati import riccati_backward, riccati_forward
from qm_door_tpu.solver.parallel_riccati import (
    parallel_forward_rollout,
    parallel_riccati_backward,
)
from tests.test_solver import _random_lq


def test_parallel_matches_sequential(rng):
    lq = _random_lq(rng, N=12, nx=5, nu=3)
    K_seq, k_seq, _, _ = riccati_backward(lq)
    K_par, k_par = parallel_riccati_backward(lq)
    np.testing.assert_allclose(K_par, K_seq, atol=1e-8)
    np.testing.assert_allclose(k_par, k_seq, atol=1e-8)


def test_parallel_long_horizon(rng):
    lq = _random_lq(rng, N=96, nx=6, nu=4)
    K_seq, k_seq, _, _ = riccati_backward(lq)
    K_par, k_par = parallel_riccati_backward(lq)
    np.testing.assert_allclose(K_par, K_seq, atol=1e-6)
    np.testing.assert_allclose(k_par, k_seq, atol=1e-6)
    # identical trajectories
    dx0 = jnp.asarray(rng.normal(size=6))
    dX1, _, _ = riccati_forward(lq, K_seq, k_seq, dx0)
    dX2, _, _ = riccati_forward(lq, K_par, k_par, dx0)
    np.testing.assert_allclose(dX1, dX2, atol=1e-6)


def test_parallel_forward_rollout(rng):
    N, n = 17, 4
    A = jnp.asarray(rng.normal(size=(N, n, n)) * 0.4)
    b = jnp.asarray(rng.normal(size=(N, n)))
    dx0 = jnp.asarray(rng.normal(size=n))
    X = parallel_forward_rollout(A, b, dx0)
    x = dx0
    for k in range(N):
        x = A[k] @ x + b[k]
        np.testing.assert_allclose(X[k + 1], x, atol=1e-10)
