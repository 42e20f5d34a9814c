"""Batch-major WBC path (wbc.qp.solve_qp_batched / wbc.hoqp.solve_hierarchy_batched)
must match the per-robot reference path exactly.

The batch-major formulation exists so the lanes-last Pallas SPD kernel
(ops/pallas_chol) can sit inside the QP interior-point loop — the production
closed-loop path (sim/batched_rollout.py) routes every WBC tick through it.
On CPU the backend defaults to "xla", so these tests check the reshaping /
broadcasting algebra; kernel-vs-XLA agreement is covered by test_pallas_ops.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qm_door_tpu.config import default_config
from qm_door_tpu.models import centroidal
from qm_door_tpu.wbc.qp import solve_qp, solve_qp_batched
from qm_door_tpu.wbc.hoqp import (
    Task, null_projector, null_projector_batched,
    solve_hierarchy, solve_hierarchy_batched,
)
from qm_door_tpu.wbc.wbc import WbcState, hierarchical_wbc, hierarchical_wbc_batched


def test_solve_qp_batched_matches_single(rng):
    B, n, m = 6, 10, 14
    Hs = []
    for _ in range(B):
        L = rng.normal(size=(n, n))
        Hs.append(L @ L.T + n * np.eye(n))
    H = jnp.asarray(np.stack(Hs))
    c = jnp.asarray(rng.normal(size=(B, n)))
    G = jnp.asarray(rng.normal(size=(B, m, n)))
    h = jnp.asarray(rng.uniform(0.5, 2.0, size=(B, m)))
    z_ref = jnp.stack([solve_qp(H[i], c[i], G[i], h[i])[0] for i in range(B)])
    z_b, lam_b, s_b = solve_qp_batched(H, c, G, h)
    np.testing.assert_allclose(np.asarray(z_b), np.asarray(z_ref), atol=1e-10)
    assert z_b.shape == (B, n) and lam_b.shape == (B, m)


def test_null_projector_batched_matches_single(rng):
    B, m, n = 4, 5, 12
    A = jnp.asarray(rng.normal(size=(B, m, n)))
    A = A.at[:, 2].set(0.0)  # a masked row in every element
    P_ref = jnp.stack([null_projector(A[i]) for i in range(B)])
    P_b = null_projector_batched(A)
    np.testing.assert_allclose(np.asarray(P_b), np.asarray(P_ref), atol=1e-12)


def test_solve_hierarchy_batched_matches_single(rng):
    B, n = 5, 10
    levels = [(4, 6), (3, 0), (2, 0)]
    tasks = []
    for r, q in levels:
        A = rng.normal(size=(B, r, n))
        b = rng.normal(size=(B, r))
        D = rng.normal(size=(B, q, n))
        f = rng.uniform(0.5, 2.0, size=(B, q))
        tasks.append(Task(*(jnp.asarray(a) for a in (A, b, D, f))))
    x_ref = jnp.stack([
        solve_hierarchy([Task(t.A[i], t.b[i], t.D[i], t.f[i]) for t in tasks])
        for i in range(B)
    ])
    x_b = solve_hierarchy_batched(tasks)
    scale = float(jnp.abs(x_ref).max())
    np.testing.assert_allclose(
        np.asarray(x_b), np.asarray(x_ref), atol=2e-6 * max(scale, 1.0))


@pytest.mark.parametrize("dtype", [jnp.float64, jnp.float32])
def test_hierarchical_wbc_batched_matches_vmap(rng, dtype):
    """Full WBC tick on the real robot stack: batch-major == vmapped."""
    from qm_door_tpu.models import aliengo_z1

    model = aliengo_z1(dtype=dtype)
    cfg = default_config()
    B = 4
    x0 = jnp.asarray(cfg.initial_state(), dtype=dtype)
    xs = jnp.asarray(
        np.asarray(x0)[None] + rng.normal(size=(B, 30)) * 0.01, dtype=dtype)
    flags = jnp.asarray([1.0, 0.0, 0.0, 1.0], dtype=dtype)
    u_des = centroidal.weight_compensating_input(model, flags)
    us = jnp.tile(u_des[None], (B, 1))
    rbds = jnp.stack([
        centroidal.rbd_from_generalized(
            model, centroidal.pinocchio_q(xs[i]), jnp.zeros(24, dtype=dtype))
        for i in range(B)
    ])
    flagss = jnp.tile(flags[None], (B, 1))

    def one(x, u, r, f):
        cmd, _ = hierarchical_wbc(
            model, cfg.wbc, x, u, r, f, WbcState.init(dtype=dtype), 0.002,
            use_arm_init=False,
        )
        return cmd

    cmd_ref = jax.vmap(one)(xs, us, rbds, flagss)
    state = WbcState(input_last=jnp.zeros((B, 30), dtype=dtype))
    cmd_b, _ = hierarchical_wbc_batched(
        model, cfg.wbc, xs, us, rbds, flagss, state, 0.002,
        use_arm_init=False, backend="xla",
    )
    assert bool(jnp.isfinite(cmd_b).all())
    # f64 proves the batch-major algebra is bit-faithful to the vmapped path.
    # At f32 the two PDIP cascades accumulate different rounding through the
    # 3-level null-space chain, which amplifies in the flat (h_reg-pinned)
    # swing-joint-acceleration directions: measured between-path deviation is
    # 0.024 relative after the round-3 projector-equilibration + active-set
    # polish fixes, while EITHER path's distance to the f64 truth in those
    # same directions is ~0.5 (the f32 vs f64 h_reg values select different
    # minimum-norm solutions of the same degenerate objective). So the f32
    # case asserts elementwise closeness at the measured-parity level plus
    # PHYSICAL equivalence: both solutions satisfy the level-0 floating-base
    # EoM to ~2e-3 (was 0.23 before the projector conditioning fix).
    tol = 0.04 if dtype == jnp.float32 else 1e-6
    scale = np.maximum(np.abs(np.asarray(cmd_ref)), 1.0)
    np.testing.assert_allclose(
        np.asarray(cmd_b) / scale, np.asarray(cmd_ref) / scale, atol=tol)
    if dtype == jnp.float32:
        from qm_door_tpu.wbc import tasks as T

        for i in range(B):
            data = T.build_wbc_data(
                model, xs[i], us[i], rbds[i], flagss[i],
                jnp.zeros(30, dtype=dtype), 0.002)
            eom = T.floating_base_eom_task(data)
            for cmd in (cmd_b[i], cmd_ref[i]):
                res = eom.A @ cmd[:36] - eom.b
                assert float(jnp.abs(res).max()) < 1e-2, res


def test_slack_qp_matches_stacked():
    """solve_qp_slack_batched (Schur-condensed HoQp level QP) must land on
    the same minimizer as stacking [z; v] through solve_qp_batched."""
    import jax.numpy as jnp
    import numpy as np

    from qm_door_tpu.wbc.qp import solve_qp_batched, solve_qp_slack_batched

    rng = np.random.default_rng(7)
    B, n, nv, mp = 4, 9, 5, 3
    Az = rng.normal(size=(B, n + 2, n))
    Hz = jnp.asarray(Az.swapaxes(-1, -2) @ Az + 1e-6 * np.eye(n))
    cz = jnp.asarray(rng.normal(size=(B, n)))
    G1 = jnp.asarray(rng.normal(size=(B, nv, n)))
    h1 = jnp.asarray(rng.normal(size=(B, nv)) + 0.5)
    Gp = jnp.asarray(rng.normal(size=(B, mp, n)))
    hp = jnp.asarray(rng.normal(size=(B, mp)) + 0.5)

    z_s, v_s = solve_qp_slack_batched(Hz, cz, G1, h1, Gp, hp, iters=40)

    # stacked reference
    H = np.zeros((B, n + nv, n + nv))
    H[:, :n, :n] = np.asarray(Hz)
    H[:, n:, n:] = np.eye(nv)
    c = np.concatenate([np.asarray(cz), np.zeros((B, nv))], axis=-1)
    G = np.concatenate(
        [
            np.concatenate([np.asarray(G1), -np.tile(np.eye(nv), (B, 1, 1))], axis=-1),
            np.concatenate([np.zeros((B, nv, n)), -np.tile(np.eye(nv), (B, 1, 1))], axis=-1),
            np.concatenate([np.asarray(Gp), np.zeros((B, mp, nv))], axis=-1),
        ],
        axis=1,
    )
    h = np.concatenate([np.asarray(h1), np.zeros((B, nv)), np.asarray(hp)], axis=-1)
    sol, _, _ = solve_qp_batched(jnp.asarray(H), jnp.asarray(c),
                                 jnp.asarray(G), jnp.asarray(h), iters=40)
    z_ref, v_ref = np.asarray(sol[:, :n]), np.asarray(sol[:, n:])

    np.testing.assert_allclose(np.asarray(z_s), z_ref, atol=5e-6)
    np.testing.assert_allclose(np.asarray(v_s), v_ref, atol=5e-6)


def test_slack_qp_empty_groups():
    """nv = 0 (unconstrained but inherited rows) and mp = 0 shapes."""
    import jax.numpy as jnp
    import numpy as np

    from qm_door_tpu.wbc.qp import solve_qp_batched, solve_qp_slack_batched

    rng = np.random.default_rng(8)
    B, n = 3, 6
    Az = rng.normal(size=(B, n + 1, n))
    Hz = jnp.asarray(Az.swapaxes(-1, -2) @ Az + 1e-6 * np.eye(n))
    cz = jnp.asarray(rng.normal(size=(B, n)))
    Gp = jnp.asarray(rng.normal(size=(B, 4, n)))
    hp = jnp.asarray(rng.normal(size=(B, 4)) + 0.5)
    z0 = jnp.zeros((B, 0, n))
    h0 = jnp.zeros((B, 0))

    # nv = 0, mp > 0: plain inequality QP
    z_s, v_s = solve_qp_slack_batched(Hz, cz, z0, h0, Gp, hp, iters=40)
    sol, _, _ = solve_qp_batched(Hz, cz, Gp, hp, iters=40)
    np.testing.assert_allclose(np.asarray(z_s), np.asarray(sol), atol=5e-6)
    assert v_s.shape == (B, 0)

    # nv = 0, mp = 0: unconstrained -> Newton solve
    z_u, _ = solve_qp_slack_batched(Hz, cz, z0, h0, jnp.zeros((B, 0, n)),
                                    jnp.zeros((B, 0)), iters=40)
    ref = np.stack([np.linalg.solve(np.asarray(Hz[b]), -np.asarray(cz[b]))
                    for b in range(B)])
    np.testing.assert_allclose(np.asarray(z_u), ref, rtol=1e-6, atol=1e-8)


def test_hierarchical_wbc_ft_batched_matches_vmap(rng):
    """42-var force-tracking tick: batch-major == vmapped (f64 bit-faithful)."""
    from qm_door_tpu.models import aliengo_z1
    from qm_door_tpu.wbc.force import hierarchical_wbc_ft, hierarchical_wbc_ft_batched

    dtype = jnp.float64
    model = aliengo_z1(dtype=dtype)
    cfg = default_config()
    B = 3
    x0 = jnp.asarray(cfg.initial_state(), dtype=dtype)
    xs = jnp.asarray(
        np.asarray(x0)[None] + rng.normal(size=(B, 30)) * 0.01, dtype=dtype)
    flags = jnp.asarray([1.0, 0.0, 0.0, 1.0], dtype=dtype)
    u_des = centroidal.weight_compensating_input(model, flags)
    u_ft = jnp.concatenate(
        [u_des, jnp.asarray([5.0, 0.0, 0.0, 0.0, 0.0, 0.5], dtype=dtype)])
    us = jnp.tile(u_ft[None], (B, 1))
    rbds = jnp.stack([
        centroidal.rbd_from_generalized(
            model, centroidal.pinocchio_q(xs[i]), jnp.zeros(24, dtype=dtype))
        for i in range(B)
    ])
    flagss = jnp.tile(flags[None], (B, 1))
    grasp = jnp.asarray([1.0, 0.0, 1.0], dtype=dtype)

    def one(x, u, r, f, g):
        cmd, _ = hierarchical_wbc_ft(
            model, cfg.wbc, x, u, r, f, g,
            WbcState.init(dtype=dtype, nu=36), 0.002,
        )
        return cmd

    cmd_ref = jax.vmap(one)(xs, us, rbds, flagss, grasp)
    state = WbcState(input_last=jnp.zeros((B, 36), dtype=dtype))
    cmd_b, _ = hierarchical_wbc_ft_batched(
        model, cfg.wbc, xs, us, rbds, flagss, grasp, state, 0.002,
        backend="xla",
    )
    assert cmd_b.shape == (B, 60)
    assert bool(jnp.isfinite(cmd_b).all())
    scale = np.maximum(np.abs(np.asarray(cmd_ref)), 1.0)
    np.testing.assert_allclose(
        np.asarray(cmd_b) / scale, np.asarray(cmd_ref) / scale, atol=1e-6)
