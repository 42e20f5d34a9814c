"""Equivalence tests for the lanes-last Pallas LQ kernels (interpret mode).

Each kernel is compared against the pure-JAX reference path
(solver/projection.py project_node_chol + solver/transcription.py project_ocp
+ solver/riccati.py lqr_solve) on random LQ data with realistic contact
masking. Interpret mode executes the kernel semantics on CPU at f64.
"""
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qm_door_tpu.ocp import constraints as cons
from qm_door_tpu.ocp.problem import StageData
from qm_door_tpu.solver.transcription import LqProblem, project_ocp
from qm_door_tpu.solver.riccati import lqr_solve
from qm_door_tpu.ops import pallas_lq as pk

N = 5
B = 3  # deliberately not a multiple of the tile (exercises padding)
BT = 4
SHIFT = 1e-5


def _random_lq(rng, n_nodes, dtype=jnp.float64):
    def spd(n, scale=1.0):
        W = rng.normal(size=(n_nodes, n, n)) * scale
        return jnp.asarray(W @ W.transpose(0, 2, 1) + 0.5 * np.eye(n), dtype)

    flags = jnp.asarray(rng.integers(0, 2, size=(n_nodes, 4)), dtype)
    act = cons.velocity_row_mask(flags)                      # (N, 12)
    A = jnp.asarray(np.eye(30) + 0.05 * rng.normal(size=(n_nodes, 30, 30)), dtype)
    Bm = jnp.asarray(0.1 * rng.normal(size=(n_nodes, 30, 30)), dtype)
    d = jnp.asarray(0.01 * rng.normal(size=(n_nodes, 30)), dtype)
    lx = jnp.asarray(rng.normal(size=(n_nodes, 30)), dtype)
    lu = jnp.asarray(rng.normal(size=(n_nodes, 30)), dtype)
    lxx = spd(30)
    luu = spd(30)
    lux = jnp.asarray(0.1 * rng.normal(size=(n_nodes, 30, 30)), dtype)
    g0 = jnp.asarray(rng.normal(size=(n_nodes, 12)), dtype) * act
    Gx = jnp.asarray(rng.normal(size=(n_nodes, 12, 30)), dtype) * act[:, :, None]
    Gv = jnp.asarray(rng.normal(size=(n_nodes, 12, 18)), dtype) * act[:, :, None]
    lq = LqProblem(
        A=A, B=Bm, d=d, lx=lx, lu=lu, lxx=lxx, luu=luu, lux=lux,
        cost=jnp.zeros((), dtype),
        g0=g0, Gx=Gx, Gv=Gv,
        lx_f=jnp.asarray(rng.normal(size=30), dtype),
        lxx_f=spd(30)[0],
    )
    return lq, flags


def _reference_solution(lq, flags, U, dx0):
    stage = types.SimpleNamespace(contact_flags=flags)
    plq = project_ocp(lq, stage, U, shift=SHIFT, method="chol")
    dX, dU, K, kff = lqr_solve(plq, dx0)
    return plq, dX, dU, K, kff


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(7)
    lqs, flagss, Us, dx0s = [], [], [], []
    for _ in range(B):
        lq, flags = _random_lq(rng, N)
        lqs.append(lq)
        flagss.append(flags)
        Us.append(jnp.asarray(rng.normal(size=(N, 30)), jnp.float64))
        dx0s.append(jnp.asarray(0.1 * rng.normal(size=30), jnp.float64))
    lq_b = jax.tree.map(lambda *xs: jnp.stack(xs), *lqs)
    flags_b = jnp.stack(flagss)
    U_b = jnp.stack(Us)
    dx0_b = jnp.stack(dx0s)
    refs = [_reference_solution(lqs[i], flagss[i], Us[i], dx0s[i])
            for i in range(B)]
    return lq_b, flags_b, U_b, dx0_b, refs


def test_end_to_end_matches_reference(problem):
    lq_b, flags_b, U_b, dx0_b, refs = problem
    act = cons.velocity_row_mask(flags_b)
    fm = jnp.repeat(flags_b, 3, axis=-1)
    F_bar = U_b[:, :, :12]
    dX, dU = pk.solve_lq_batched(lq_b, act, fm, F_bar, dx0_b, shift=SHIFT,
                                 interpret=True, batch_tile=BT)
    for i in range(B):
        _, dX_ref, dU_ref, _, _ = refs[i]
        np.testing.assert_allclose(dX[i], dX_ref, rtol=1e-8, atol=1e-9)
        np.testing.assert_allclose(dU[i], dU_ref, rtol=1e-8, atol=1e-9)


def test_projection_kernel_matches_reference(problem):
    lq_b, flags_b, U_b, dx0_b, refs = problem
    act = cons.velocity_row_mask(flags_b)
    fm = jnp.repeat(flags_b, 3, axis=-1)
    F_bar = U_b[:, :, :12]

    def t4(x):
        return jnp.transpose(x, (1, 2, 3, 0))

    def t4T(x):
        return jnp.transpose(x, (1, 3, 2, 0))

    def t3(x):
        return jnp.transpose(x, (1, 2, 0))

    out = pk.project_lq(
        t4(lq_b.A), t4(lq_b.B), t4T(lq_b.B), t3(lq_b.d), t3(lq_b.lx),
        t3(lq_b.lu), t4(lq_b.lxx), t4(lq_b.luu), t4(lq_b.lux), t3(lq_b.g0),
        t4(lq_b.Gx), t4(lq_b.Gv), t4T(lq_b.Gv), t3(F_bar), t3(act), t3(fm),
        shift=SHIFT, interpret=True, batch_tile=BT)
    A_bar, B_bar, d_bar, lxb, lub, lxxb, luub, luxb, p, P, Px_v = out
    for i in range(B):
        plq = refs[i][0]
        np.testing.assert_allclose(A_bar[..., i].transpose(0, 1, 2), plq.A,
                                   rtol=1e-8, atol=1e-10)
        np.testing.assert_allclose(B_bar[..., i], plq.B, rtol=1e-8, atol=1e-10)
        np.testing.assert_allclose(d_bar[..., i], plq.d, rtol=1e-8, atol=1e-10)
        np.testing.assert_allclose(lxb[..., i], plq.lx, rtol=1e-8, atol=1e-8)
        np.testing.assert_allclose(lub[..., i], plq.lu, rtol=1e-8, atol=1e-8)
        np.testing.assert_allclose(lxxb[..., i], plq.lxx, rtol=1e-8, atol=1e-8)
        np.testing.assert_allclose(luub[..., i], plq.luu, rtol=1e-8, atol=1e-8)
        np.testing.assert_allclose(luxb[..., i], plq.lux, rtol=1e-8, atol=1e-8)
        np.testing.assert_allclose(p[..., i], plq.p, rtol=1e-8, atol=1e-10)
        # Pu block structure: rows 12:30, cols 12:30 hold the projector P
        np.testing.assert_allclose(P[..., i], plq.Pu[:, 12:30, 12:30],
                                   rtol=1e-8, atol=1e-10)
        np.testing.assert_allclose(Px_v[..., i], plq.Px[:, 12:30, :],
                                   rtol=1e-8, atol=1e-10)


def test_backward_kernel_matches_reference(problem):
    from qm_door_tpu.solver.riccati import riccati_backward

    lq_b, flags_b, U_b, dx0_b, refs = problem
    for i in range(B):
        plq = refs[i][0]
        # single-scenario batch of 1 (padded to BT inside the wrapper)
        K, kff = pk.riccati_backward_ll(
            plq.A[..., None], plq.B[..., None], plq.d[..., None],
            plq.lx[..., None], plq.lu[..., None],
            plq.lxx[..., None], plq.luu[..., None], plq.lux[..., None],
            plq.lxx_f[..., None], plq.lx_f[..., None],
            interpret=True, batch_tile=BT)
        K_ref, kff_ref, _, _ = riccati_backward(plq)
        np.testing.assert_allclose(K[..., 0], K_ref, rtol=1e-7, atol=1e-8)
        np.testing.assert_allclose(kff[..., 0], kff_ref, rtol=1e-7, atol=1e-8)
