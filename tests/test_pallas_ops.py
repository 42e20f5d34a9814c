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


def _random_lq(rng, B, N, nx, nu):
    from qm_door_tpu.solver.transcription import ProjectedLq

    def spd(*s):
        M = rng.normal(size=s + (s[-1],)) * 0.3
        return jnp.asarray(M @ np.swapaxes(M, -1, -2) + 2.0 * np.eye(s[-1]))

    return ProjectedLq(
        A=jnp.asarray(rng.normal(size=(B, N, nx, nx)) * 0.2 + np.eye(nx)),
        B=jnp.asarray(rng.normal(size=(B, N, nx, nu)) * 0.3),
        d=jnp.asarray(rng.normal(size=(B, N, nx)) * 0.1),
        lx=jnp.asarray(rng.normal(size=(B, N, nx))),
        lu=jnp.asarray(rng.normal(size=(B, N, nu))),
        lxx=spd(B, N, nx),
        luu=spd(B, N, nu),
        lux=jnp.asarray(rng.normal(size=(B, N, nu, nx)) * 0.2),
        lxx_f=spd(B, nx),
        lx_f=jnp.asarray(rng.normal(size=(B, nx))),
        p=jnp.zeros((B, N, nu)),
        Pu=None,
        Px=None,
    )


def test_riccati_fused_matches_scan(rng):
    """Single-kernel backward Riccati sweep (ops/pallas_riccati, carry in
    VMEM) vs the production batch-major lax.scan, non-tile-aligned batch."""
    from qm_door_tpu.ops.pallas_riccati import riccati_backward_fused_lq
    from qm_door_tpu.solver.riccati import riccati_backward_batched

    lq = _random_lq(rng, 5, 9, 7, 4)
    K0, k0 = riccati_backward_batched(lq, backend="xla")
    K1, k1 = riccati_backward_fused_lq(lq, interpret=True)
    np.testing.assert_allclose(np.asarray(K0), np.asarray(K1),
                               rtol=1e-10, atol=1e-10)
    np.testing.assert_allclose(np.asarray(k0), np.asarray(k1),
                               rtol=1e-10, atol=1e-10)


def test_riccati_fused_production_shape(rng):
    """Production (nx=30, nu=26) shape at a small batch: the padded batch
    tile path (Bb < BATCH_TILE) plus the Quu shift used by the solver."""
    from qm_door_tpu.ops.pallas_riccati import riccati_backward_fused_lq
    from qm_door_tpu.solver.riccati import riccati_backward_batched

    lq = _random_lq(rng, 3, 11, 30, 26)
    K0, k0 = riccati_backward_batched(lq, backend="xla")
    K1, k1 = riccati_backward_fused_lq(lq, interpret=True)
    np.testing.assert_allclose(np.asarray(K0), np.asarray(K1),
                               rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(np.asarray(k0), np.asarray(k1),
                               rtol=1e-8, atol=1e-8)
