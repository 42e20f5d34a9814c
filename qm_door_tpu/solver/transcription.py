"""Multiple-shooting transcription: linearization + equality projection.

Replaces ocs2_sqp's per-node LQ approximation assembly (RK2 sensitivity
discretization, projection of state-input equality constraints; settings
task.info sqp { dt 0.015, integratorType RK2,
projectStateInputEqualityConstraints true }).

TPU-first encoding of the projection: the reference's per-node QR on a
variable-row constraint matrix becomes a fixed-shape masked computation:

- zero-force rows are eliminated analytically (swing-foot force deltas are
  pinned to -F_bar, stance forces stay free);
- the 12 masked foot-velocity rows are projected with a QR of the permuted
  (active-rows-first) Jacobian w.r.t. joint velocities; the null-space basis
  is padded to a fixed 14 columns with a column mask derived from the contact
  count, and padded reduced-input dims are regularized to identity so the
  Riccati recursion stays well-posed with static shapes.

Reduced input dim: 12 (masked stance forces) + 14 (padded null space) = 26.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from flax import struct

from ..models import centroidal
from ..models.model import RobotModel
from ..ocp import constraints as cons
from ..ocp.problem import (
    OcpConfig,
    StageData,
    quadratize_stage,
    quadratize_terminal,
)

NX = 30
NU = 30
NU_RED = 26  # 12 forces + 14 padded null-space coords
NV_JOINTS = 18
NC_ROWS = 12  # masked foot-velocity rows


def rk2_step(model: RobotModel, x, u, dt):
    """Heun / explicit midpoint (OCS2 SensitivityIntegrator RK2): input held
    constant over the interval. Dispatches on the static input width
    (30 nominal / 36 force-tracking)."""
    k1 = centroidal.flow_map_any(model, x, u)
    k2 = centroidal.flow_map_any(model, x + dt * k1, u)
    return x + 0.5 * dt * (k1 + k2)


@struct.dataclass
class LqProblem:
    """Per-node LQ data in the full (dx, du) space. Leading dim N (intervals)
    for dynamics/cost, N+1 handled by terminal terms."""

    A: jnp.ndarray     # (N, 30, 30)
    B: jnp.ndarray     # (N, 30, 30)
    d: jnp.ndarray     # (N, 30) defects  Phi(x_k,u_k) - x_{k+1}
    lx: jnp.ndarray    # (N, 30)   dt-scaled
    lu: jnp.ndarray    # (N, 30)
    lxx: jnp.ndarray   # (N, 30, 30)
    luu: jnp.ndarray   # (N, 30, 30)
    lux: jnp.ndarray   # (N, 30, 30)
    cost: jnp.ndarray  # () total cost of the current iterate
    # constraint data (nodes 0..N-1)
    g0: jnp.ndarray    # (N, 12) masked velocity-constraint values
    Gx: jnp.ndarray    # (N, 12, 30)
    Gv: jnp.ndarray    # (N, 12, 18)
    # terminal
    lx_f: jnp.ndarray  # (30,)
    lxx_f: jnp.ndarray # (30, 30)


@struct.dataclass
class ProjectedLq:
    """LQ data in the reduced input space, ready for Riccati."""

    A: jnp.ndarray     # (N, 30, 30)  A + B Px
    B: jnp.ndarray     # (N, 30, 26)  B Pu
    d: jnp.ndarray     # (N, 30)      d + B p
    lx: jnp.ndarray
    lu: jnp.ndarray    # (N, 26)
    lxx: jnp.ndarray
    luu: jnp.ndarray   # (N, 26, 26)
    lux: jnp.ndarray   # (N, 26, 30)
    lx_f: jnp.ndarray
    lxx_f: jnp.ndarray
    # input recovery: du = p + Pu u_red + Px dx
    p: jnp.ndarray     # (N, 30)
    Pu: jnp.ndarray    # (N, 30, 26) — dense form (per-scenario path); None
    Px: jnp.ndarray    # (N, 30, 30)   when the structured form is carried
    # structured recovery (batched path): Pu = blkdiag(diag(fm), P[, diag(g)]),
    # Px = rows 12:30 <- Px_v. Carrying the blocks instead of materializing
    # the (B,N,nu,nu) dense maps removes ~0.5 GB of HBM traffic per batched
    # solve at (512, 67) and lets the cost substitution run blockwise.
    P: jnp.ndarray | None = None        # (..., 18, 18)
    Px_v: jnp.ndarray | None = None     # (..., 18, 30)
    force_mask: jnp.ndarray | None = None  # (..., 12)
    grasp_gate: jnp.ndarray | None = None  # (...,) force-tracking only


def _node_linearization_reference(model, ocp: OcpConfig, stage: StageData, dt, k, x, u, x_next):
    """Straightforward per-node linearization (independent AD pipelines).

    Kept as the correctness reference for the fused fast path below.
    """
    step = partial(rk2_step, model, dt=dt)
    xn = step(x, u)
    A = jax.jacfwd(step, argnums=0)(x, u)
    B = jax.jacfwd(step, argnums=1)(x, u)
    d = xn - x_next

    l, lx, lu, lxx, luu, lux = quadratize_stage(model, ocp, stage, k, x, u)

    g0, Gx, Gv = cons.velocity_constraint_linearization(
        model, x, u, stage.contact_flags[k], stage.z_vel_ref[k]
    )
    return A, B, d, dt * l, dt * lx, dt * lu, dt * lxx, dt * luu, dt * lux, g0, Gx, Gv


def _flow_force_cols(model, x):
    """Analytic d(flow_map)/dF (30, 12): forces enter only the momentum-rate
    rows, with d hdot_lin/dF_i = I/m and d hdot_ang/dF_i = skew(p_ci - com)/m."""
    from ..models import dynamics as dyn
    from ..models import kinematics as kin
    from ..models import spatial

    q = centroidal.pinocchio_q(x)
    m = jnp.sum(model.body_mass)
    p_c = kin.contact_positions(model, q)           # (4,3)
    com = dyn.com_position(model, q)
    eye = jnp.eye(3, dtype=x.dtype)
    lin = jnp.concatenate([eye / m] * 4, axis=1)    # (3,12)
    ang = jnp.concatenate(
        [spatial.skew(p_c[i] - com) / m for i in range(4)], axis=1
    )                                               # (3,12)
    zeros = jnp.zeros((24, 12), dtype=x.dtype)
    return jnp.concatenate([lin, ang, zeros], axis=0)


def _flow_wrench_cols(model, x):
    """Analytic d(flow_map_ft)/dW_ee (30, 6): the EE wrench enters only the
    momentum-rate rows — d hdot_lin/dF_ee = I/m, d hdot_ang/dF_ee =
    skew(p_ee - com)/m, d hdot_ang/dtau_ee = I/m."""
    from ..models import dynamics as dyn
    from ..models import kinematics as kin
    from ..models import spatial

    q = centroidal.pinocchio_q(x)
    m = jnp.sum(model.body_mass)
    _, p_ee = kin.ee_pose(model, q)
    com = dyn.com_position(model, q)
    eye = jnp.eye(3, dtype=x.dtype)
    z3 = jnp.zeros((3, 3), dtype=x.dtype)
    lin = jnp.concatenate([eye / m, z3], axis=1)                      # (3,6)
    ang = jnp.concatenate([spatial.skew(p_ee - com) / m, eye / m], axis=1)
    zeros = jnp.zeros((24, 6), dtype=x.dtype)
    return jnp.concatenate([lin, ang, zeros], axis=0)


def _cast_bf16(tree):
    """Cast every floating leaf to bfloat16 (a single f32 operand silently
    promotes a whole chain back to f32)."""
    bf = jnp.bfloat16
    return jax.tree_util.tree_map(
        lambda a: a.astype(bf) if jnp.issubdtype(
            jnp.asarray(a).dtype, jnp.floating) else a, tree)


def _flow_q_jacobian_analytic(model, x, u, sweep: str = "f32"):
    """Closed-form d(flow)/dq (30, 24) — no tangent sweep through the CMM.

    The flow map's q-dependence decomposes into three analytic pieces
    (flow = [hdot(6); v_b(6); v_j(18)], models/centroidal.py:flow_map):

    - ``hdot_lin`` rows: q-independent (forces + gravity) — zero.
    - ``hdot_ang`` rows: d/dq sum_i (p_ci - com) x F_i / m =
      -(1/m) sum_i skew(F_i) (J_ci - Jcom), with J_ci the foot point
      Jacobians and Jcom = A[:3]/m (the CMM's linear block IS m dcom/dq in
      this chart, since P v = m d(com)/dt for every v).
    - ``v_b`` rows: v_b(q) = A_b^{-1}(m h - A_j v_j), so
      dv_b/dq = -A_b^{-1} d(A(q) v_bar)/dq at the frozen primal velocity
      v_bar — and d(A v_bar)/dq is the Jacobian of the 6-dim centroidal
      momentum, computed by REVERSE-mode AD (6 cotangent passes through the
      CMM chain instead of 21 forward tangents; the xyz columns are exact
      zeros by translation invariance of the momentum about the com).
    - ``v_j`` rows: q-independent — zero.

    Returns (dq_f1 (30,24), A (6,24), v_bar (24,), Jall (F,6,24)) with Jall
    the feet[+EE] LWA frame Jacobians (byproducts shared by the constraint
    and EE rows of the caller).
    """
    from ..models import dynamics as dyn
    from ..models import kinematics as kin
    from ..models import spatial

    dtype = x.dtype
    nu = u.shape[-1]
    q = centroidal.pinocchio_q(x)
    h = x[0:6]
    v_j = u[12:30]
    F = u[0:12].reshape(4, 3)
    m = jnp.sum(model.body_mass)

    A = dyn.centroidal_momentum_matrix(model, q)
    rhs = m * h - spatial.fmv(A[:, 6:], v_j)
    v_b = spatial.solve6_block(A[:, :6], rhs)
    v_bar = jnp.concatenate([v_b, v_j])

    # d(A v_bar)/dq: 6 cotangents, euler+joint columns only (xyz are exact
    # zeros — the momentum about the com is translation invariant, and
    # reverse-mode would only reproduce them as cancellation noise).
    xyz = q[0:3]

    if sweep == "bf16":
        # bf16 REVERSE sweep (see the lin_tangents="bf16" note): only the
        # Jacobian is bf16-derived; every primal stays f32 so the SQP fixed
        # point is exact.
        model_s, xyz_s, v_bar_s = _cast_bf16((model, xyz, v_bar))

        def w_fn(q_ej):
            q_ = jnp.concatenate([xyz_s, q_ej])
            return dyn.centroidal_momentum_matrix(model_s, q_) @ v_bar_s

        Jw_ej = jax.jacrev(w_fn)(q[3:24].astype(jnp.bfloat16)).astype(dtype)
    else:
        def w_fn(q_ej):
            q_ = jnp.concatenate([xyz, q_ej])
            return dyn.centroidal_momentum_matrix(model, q_) @ v_bar

        Jw_ej = jax.jacrev(w_fn)(q[3:24])                       # (6, 21)
    z6_3 = jnp.zeros((6, 3), dtype=dtype)
    dvb_dq = -spatial.solve6_block(
        A[:, :6], jnp.concatenate([z6_3, Jw_ej], axis=1))       # (6, 24)

    fids = tuple(model.contact_frame_ids) + (model.ee_frame_id,)
    Jall = kin.frame_jacobians(model, q, fids)                  # (5, 6, 24)
    Jcom = A[:3, :] / m

    dh_ang = jnp.zeros((3, 24), dtype=dtype)
    for i in range(4):
        dh_ang = dh_ang - spatial.fmm(
            spatial.skew(F[i]), Jall[i, :3, :] - Jcom) / m
    if nu == 36:
        W = u[30:36]
        dh_ang = dh_ang - spatial.fmm(
            spatial.skew(W[0:3]), Jall[4, :3, :] - Jcom) / m

    dq_f1 = jnp.concatenate([
        jnp.zeros((3, 24), dtype=dtype),
        dh_ang,
        dvb_dq,
        jnp.zeros((18, 24), dtype=dtype),
    ], axis=0)
    return dq_f1, A, v_bar, Jall


def _momentum_velocity_coeffs(model, q, dtype):
    """Linear-structure coefficients of the base velocity at fixed q:

        v_b = A_b(q)^{-1} (m h - A_j(q) v_j)
        d v_b / dh  = m A_b^{-1}        (6, 6)
        d v_b / dvj = -A_b^{-1} A_j     (6, 18)

    One 6x24 solve; the CMM primal is shared (CSE) with the AD pipeline.
    """
    from ..models import dynamics as dyn

    from ..models import spatial

    m = jnp.sum(model.body_mass)
    A = dyn.centroidal_momentum_matrix(model, q)  # (6, 24)
    rhs = jnp.concatenate([m * jnp.eye(6, dtype=dtype), A[:, 6:]], axis=1)
    sol = spatial.solve6_block(A[:, :6], rhs)     # (6, 24), fusable solve
    return sol[:, :6], -sol[:, 6:]


def _node_linearization(model, ocp: OcpConfig, stage: StageData, dt, k, x, u, x_next,
                        sensitivity: str = "rk2", tangents: str = "f32"):
    """Fused 24-tangent per-node linearization.

    ``sensitivity``: "rk2" = exact discrete RK2 sensitivities (second flow
    Jacobian evaluated at the midpoint state, the OCS2 SensitivityIntegrator
    behavior); "frozen" = the second-stage Jacobian reuses the first
    (A = I + dt J1 + dt^2/2 J1^2). The DEFECT stays exact RK2 either way, so
    the SQP fixed point is identical up to stationarity error O(dt^2 H xdot)
    ~1e-4 relative at dt 0.015 — below both solver tolerance and f32 noise —
    while dropping the second 24-tangent AD sweep (~90 us/solve of 395 at
    batch 512 on a v5e).

    The centroidal flow map, foot-velocity equalities and EE error are
    nonlinear only in the 24 generalized coordinates q; they are LINEAR in
    the normalized momentum h (6) and joint velocities v_j (18):

        flow = [hdot(q, F); A_b(q)^{-1}(m h - A_j(q) v_j); v_j]
        g    = M .* (J(q) [v_b; v_j] - b)
        e    = e(q)

    so one 24-tangent AD pipeline (w.r.t. q) plus analytic h / v_j / force
    columns assembled from A_b^{-1}, A_j and the foot Jacobians yields the
    full Jacobians — 24 tangents vs 48 for the previous fused path and 60
    for independent pipelines (_node_linearization_reference stays as the
    correctness oracle in tests/test_solver.py).
    """
    from ..models import kinematics as kin
    from ..ocp.problem import _ee_error

    dtype = x.dtype
    nu = u.shape[-1]  # 30 nominal / 36 force-tracking
    h_bar, q_bar = x[0:6], x[6:30]
    xyz_bar = q_bar[0:3]
    u_bar = u
    F_bar = u[0:12]
    flags = stage.contact_flags[k]
    zref = stage.z_vel_ref[k]

    # 21 AD tangents (euler + joints): every stage-1 output is invariant to a
    # base TRANSLATION except the EE position error, whose xyz columns are
    # exactly I3 (p_ee = base_xyz + R(.)(...)). The centroidal flow map and
    # the foot-velocity constraint only see relative geometry (p_ci - com,
    # p_f - o_j, CMM about the com), so their xyz columns are analytic zeros —
    # the AD graph would only reproduce them as f32 cancellation noise.
    def stage1(q_ej):
        x_ = jnp.concatenate([h_bar, xyz_bar, q_ej])
        f1 = centroidal.flow_map_any(model, x_, u_bar)
        g = cons.velocity_constraint(model, x_, u_bar, flags, zref)
        e = _ee_error(model, ocp, x_, stage.ee_pos_ref[k], stage.ee_quat_ref[k])
        return jnp.concatenate([f1, g, e])

    if tangents in ("analytic", "analytic_bf16"):
        # Analytic/geometric derivatives: no 21-tangent sweep at all. The
        # only AD left is (a) 6 REVERSE cotangents through the CMM (inside
        # _flow_q_jacobian_analytic) and (b) a 21-tangent sweep through the
        # FK-ONLY foot-velocity chain + a 3-tangent quaternion-error
        # differential — each a small fraction of the full stage1 graph the
        # f32/bf16 modes sweep. "analytic" is exact (no bf16 rounding);
        # "analytic_bf16" additionally runs the two remaining sweeps in
        # bfloat16 (primals and closed-form rows stay f32, so the SQP fixed
        # point is exact either way). Equivalence pinned by
        # tests/test_solver.py::test_analytic_linearization_matches_ad.
        sweep = "bf16" if tangents == "analytic_bf16" else "f32"
        dq_f1, _A_cmm, v_bar_frozen, Jall = _flow_q_jacobian_analytic(
            model, x, u, sweep=sweep)
        f1 = centroidal.flow_map_any(model, x, u)
        g0 = cons.velocity_constraint(model, x, u, flags, zref)
        e = _ee_error(model, ocp, x, stage.ee_pos_ref[k], stage.ee_quat_ref[k])

        # Foot-velocity rows keep a 21-tangent sweep through the FK-ONLY
        # chain: a closed geometric form (masked cross-product chains over
        # (foot, joint, joint) world-axis/origin differentials) was derived,
        # f64-verified, and MEASURED SLOWER on the v5e (6095 vs 6991
        # solves/s at batch 384) — the (4,18,18,3) per-node cross tensors
        # materialize comparable HBM bytes to the lean FK sweep and lower
        # worse (docs/PERF.md round-5 analytic-linearize section).
        z12_3 = jnp.zeros((12, 3), dtype=dtype)

        if sweep == "bf16":
            model_s, xyz_s, v_bar_s = _cast_bf16((model, xyz_bar, v_bar_frozen))

            def fv_fn(q_ej):
                q_ = jnp.concatenate([xyz_s, q_ej])
                J = kin.frame_jacobians(
                    model_s, q_, tuple(model.contact_frame_ids))
                from ..models import spatial as sp
                return sp.fmv(J[:, :3, :], v_bar_s).reshape(12)

            Jfv_ej = jax.jacfwd(fv_fn)(
                q_bar[3:24].astype(jnp.bfloat16)).astype(dtype)  # (12, 21)
        else:
            def fv_fn(q_ej):
                q_ = jnp.concatenate([xyz_bar, q_ej])
                J = kin.frame_jacobians(
                    model, q_, tuple(model.contact_frame_ids))
                from ..models import spatial as sp
                return sp.fmv(J[:, :3, :], v_bar_frozen).reshape(12)

            Jfv_ej = jax.jacfwd(fv_fn)(q_bar[3:24])              # (12, 21)
        mask_rows = cons.velocity_row_mask(flags)
        Jlin12 = Jall[:4, :3, :].reshape(12, 24)
        dvb_dq = dq_f1[6:12]
        dq_g = mask_rows[:, None] * (
            jnp.concatenate([z12_3, Jfv_ej], axis=1) + Jlin12[:, :6] @ dvb_dq)

        from ..models import spatial as sp
        R_ee, _ = kin.ee_pose(model, q_bar)
        quat_ref = stage.ee_quat_ref[k]
        eye3 = jnp.eye(3, dtype=dtype)
        D_ori = jax.jacfwd(lambda t: sp.quat_error_ocs2(
            sp.rot_to_quat((eye3 + sp.skew(t)) @ R_ee), quat_ref
        ))(jnp.zeros(3, dtype=dtype))                            # (3, 3)
        Je_q = jnp.concatenate(
            [Jall[4, :3, :], D_ori @ Jall[4, 3:6, :]], axis=0)   # (6, 24)
    elif tangents == "bf16":
        # bf16 TANGENT sweep: the 21-tangent intermediates are ~99% of the
        # linearize stage's HBM bytes (docs/PERF.md roofline) and the step
        # is bandwidth-bound, so halving them converts ~1:1 to throughput.
        # Only the Jacobian J1 is bf16-derived; the primal outputs (defects,
        # constraint values, EE error) are recomputed in f32 below (~1/21 of
        # the tangent cost), so the SQP FIXED POINT is exact — the bf16
        # Jacobian only perturbs the Newton convergence path. Every captured
        # operand must be cast (a single f32 operand silently promotes the
        # whole chain back to f32).
        bf = jnp.bfloat16
        castl = lambda a: a.astype(bf) if jnp.issubdtype(
            jnp.asarray(a).dtype, jnp.floating) else a
        model_b = jax.tree_util.tree_map(castl, model)
        h_b, xyz_b, u_b = (castl(v) for v in (h_bar, xyz_bar, u_bar))
        flags_b, zref_b = castl(flags), castl(zref)
        pos_ref_b = castl(stage.ee_pos_ref[k])
        quat_ref_b = castl(stage.ee_quat_ref[k])

        def stage1_t(q_ej):
            x_ = jnp.concatenate([h_b, xyz_b, q_ej])
            f1 = centroidal.flow_map_any(model_b, x_, u_b)
            g = cons.velocity_constraint(model_b, x_, u_b, flags_b, zref_b)
            e = _ee_error(model_b, ocp, x_, pos_ref_b, quat_ref_b)
            return jnp.concatenate([f1, g, e])

        _, jvp1 = jax.linearize(stage1_t, q_bar[3:24].astype(bf))
        J1 = jax.vmap(jvp1)(jnp.eye(21, dtype=bf)).T.astype(dtype)
        out1 = stage1(q_bar[3:24])  # f32 primal (exact defects/values)
    else:
        out1, jvp1 = jax.linearize(stage1, q_bar[3:24])
        J1 = jax.vmap(jvp1)(jnp.eye(21, dtype=dtype)).T   # (48, 21)
    z30_3 = jnp.zeros((30, 3), dtype=dtype)
    if not tangents.startswith("analytic"):
        f1, g0, e = out1[:30], out1[30:42], out1[42:48]
        z12_3 = jnp.zeros((12, 3), dtype=dtype)
        e_xyz = jnp.concatenate(
            [jnp.eye(3, dtype=dtype), jnp.zeros((3, 3), dtype=dtype)], axis=0)
        dq_f1 = jnp.concatenate([z30_3, J1[:30]], axis=1)     # (30, 24)
        dq_g = jnp.concatenate([z12_3, J1[30:42]], axis=1)    # (12, 24)
        Je_q = jnp.concatenate([e_xyz, J1[42:48]], axis=1)    # (6, 24)

    dvb_dh, dvb_dvj = _momentum_velocity_coeffs(model, q_bar, dtype)
    z6_6 = jnp.zeros((6, 6), dtype=dtype)
    z18_6 = jnp.zeros((18, 6), dtype=dtype)
    z6_18 = jnp.zeros((6, 18), dtype=dtype)
    df1_dh = jnp.concatenate([z6_6, dvb_dh, z18_6], axis=0)       # (30, 6)
    df1_dvj = jnp.concatenate(
        [z6_18, dvb_dvj, jnp.eye(18, dtype=dtype)], axis=0
    )                                                             # (30, 18)

    Jfeet = kin.frame_jacobians(model, q_bar, model.contact_frame_ids)
    Jlin = Jfeet[:, :3, :].reshape(12, 24)
    mask = cons.velocity_row_mask(flags)
    dg_dh = mask[:, None] * (Jlin[:, :6] @ dvb_dh)                # (12, 6)
    dg_dvj = mask[:, None] * (Jlin[:, :6] @ dvb_dvj + Jlin[:, 6:])

    df1_dx = jnp.concatenate([df1_dh, dq_f1], axis=1)             # (30, 30)
    du_cols1 = [_flow_force_cols(model, x), df1_dvj]
    if nu == 36:
        du_cols1.append(_flow_wrench_cols(model, x))
    df1_du = jnp.concatenate(du_cols1, axis=1)                    # (30, nu)
    Gx = jnp.concatenate([dg_dh, dq_g], axis=1)                   # (12, 30)
    Gv = dg_dvj
    Je = jnp.concatenate([jnp.zeros((6, 6), dtype=dtype), Je_q], axis=1)

    x2 = x + dt * f1
    h2, q2 = x2[0:6], x2[6:30]

    if sensitivity == "frozen":
        f2 = centroidal.flow_map_any(model, x2, u_bar)
        df2_dx2 = df1_dx
        df2_du = df1_du
    else:
        xyz2 = q2[0:3]

        if tangents.startswith("analytic"):
            J2q, _, _, _ = _flow_q_jacobian_analytic(
                model, x2, u_bar,
                sweep="bf16" if tangents == "analytic_bf16" else "f32")
            f2 = centroidal.flow_map_any(model, x2, u_bar)
        else:
            def stage2(q_ej):
                return centroidal.flow_map_any(
                    model, jnp.concatenate([h2, xyz2, q_ej]), u_bar)

            f2, jvp2 = jax.linearize(stage2, q2[3:24])
            J2q_ej = jax.vmap(jvp2)(jnp.eye(21, dtype=dtype)).T   # (30, 21)
            J2q = jnp.concatenate([z30_3, J2q_ej], axis=1)        # (30, 24)
        dvb2_dh, dvb2_dvj = _momentum_velocity_coeffs(model, q2, dtype)
        df2_dh = jnp.concatenate([z6_6, dvb2_dh, z18_6], axis=0)
        df2_dvj = jnp.concatenate(
            [z6_18, dvb2_dvj, jnp.eye(18, dtype=dtype)], axis=0
        )
        df2_dx2 = jnp.concatenate([df2_dh, J2q], axis=1)
        du_cols2 = [_flow_force_cols(model, x2), df2_dvj]
        if nu == 36:
            du_cols2.append(_flow_wrench_cols(model, x2))
        df2_du = jnp.concatenate(du_cols2, axis=1)                # (30, nu)

    # RK2 (Heun) discrete sensitivities: Phi = x + dt/2 (f1 + f2(x + dt f1, u))
    eye30 = jnp.eye(30, dtype=x.dtype)
    A = eye30 + 0.5 * dt * (df1_dx + df2_dx2 @ (eye30 + dt * df1_dx))
    B = 0.5 * dt * (df1_du + df2_du + dt * (df2_dx2 @ df1_du))
    d = x + 0.5 * dt * (f1 + f2) - x_next

    l, lx, lu, lxx, luu, lux = quadratize_stage(
        model, ocp, stage, k, x, u, ee_lin=(e, Je)
    )
    return A, B, d, dt * l, dt * lx, dt * lu, dt * lxx, dt * luu, dt * lux, g0, Gx, Gv


def linearize_ocp(model: RobotModel, ocp: OcpConfig, stage: StageData, dt, X, U,
                  node_chunk: int = 0, sensitivity: str = "rk2",
                  tangents: str = "f32") -> LqProblem:
    """Vectorized linearization of dynamics/cost/constraints along (X, U).

    X: (N+1, 30), U: (N, 30). ``node_chunk`` > 0 processes nodes in chunks
    (lax.map batch_size) to bound the jacfwd workspace at large scenario
    batches; 0 vectorizes all nodes at once. ``sensitivity`` /
    ``tangents``: see :func:`_node_linearization`.
    """
    N = U.shape[0]
    ks = jnp.arange(N)
    fn = partial(_node_linearization, model, ocp, stage, dt,
                 sensitivity=sensitivity, tangents=tangents)
    if node_chunk and node_chunk < N:
        A, B, d, l, lx, lu, lxx, luu, lux, g0, Gx, Gv = jax.lax.map(
            lambda args: fn(*args), (ks, X[:-1], U, X[1:]), batch_size=node_chunk
        )
    else:
        A, B, d, l, lx, lu, lxx, luu, lux, g0, Gx, Gv = jax.vmap(fn)(
            ks, X[:-1], U, X[1:]
        )
    lf, lx_f, lxx_f = quadratize_terminal(model, ocp, stage, X[-1])
    return LqProblem(
        A=A, B=B, d=d, lx=lx, lu=lu, lxx=lxx, luu=luu, lux=lux,
        cost=jnp.sum(l) + lf,
        g0=g0, Gx=Gx, Gv=Gv, lx_f=lx_f, lxx_f=lxx_f,
    )


def _row_permutation(flags):
    """Permutation putting active velocity rows first (stable).

    Row activity: stance foot -> (1,1,1); swing foot -> (0,0,1).
    Returns (perm (12,), r) with r = number of active rows = 2c + 4.
    """
    activity = cons.velocity_row_mask(flags)  # (12,)
    perm = jnp.argsort(-activity, stable=True)
    r = jnp.sum(activity).astype(jnp.int32)
    return perm, activity, r


def _project_node(flags, F_bar, g0, Gx, Gv, shift):
    """Build the affine reduced-input parametrization for one node.

    du = p + Pu u_red + Px dx,  u_red = [dF_tilde(12); w(14)].
    """
    dtype = g0.dtype
    perm, activity, r = _row_permutation(flags)
    g0p = g0[perm]
    Gxp = Gx[perm]
    Gvp = Gv[perm]

    # QR of Gv_perm^T (18 x 12): Gv = R^T Q^T.
    Q, R = jnp.linalg.qr(Gvp.T, mode="complete")  # Q (18,18), R (18,12)
    Rtop = R[:NC_ROWS, :]  # (12,12) upper triangular; cols >= r are zero

    # Padded triangular solve: R^T y = rhs with unit diagonal on inactive rows.
    row_idx = jnp.arange(NC_ROWS)
    active_row = row_idx < r
    diag_fix = jnp.where(active_row, 0.0, 1.0)
    Rsafe = Rtop + jnp.diag(diag_fix).astype(dtype)

    def pinv_apply(rhs):
        # rhs (12, ...) masked so inactive entries are zero.
        y = jax.scipy.linalg.solve_triangular(Rsafe.T, rhs, lower=True)
        return Q[:, :NC_ROWS] @ y  # (18, ...)

    du_part = -pinv_apply(g0p)                 # (18,)
    Px_v = -pinv_apply(Gxp)                    # (18, 30)

    # Null-space basis: columns r .. r+13 of Q, masked by j < 18 - r.
    cols = jnp.clip(r + jnp.arange(14), 0, 17)
    w_mask = (jnp.arange(14) < (NV_JOINTS - r)).astype(dtype)
    Nbasis = Q[:, cols] * w_mask[None, :]      # (18, 14)

    # Force elimination: stance dims free, swing dims pinned to -F_bar.
    force_mask = jnp.repeat(flags, 3)          # (12,) 1 = stance
    p_F = -(1.0 - force_mask) * F_bar
    PuF = jnp.diag(force_mask).astype(dtype)   # (12,12)

    p = jnp.concatenate([p_F, du_part])
    Pu = jnp.zeros((NU, NU_RED), dtype=dtype)
    Pu = Pu.at[0:12, 0:12].set(PuF)
    Pu = Pu.at[12:30, 12:26].set(Nbasis)
    Px = jnp.zeros((NU, NX), dtype=dtype)
    Px = Px.at[12:30, :].set(Px_v)

    # Regularization mask for padded reduced dims (swing forces, padded w).
    red_mask = jnp.concatenate([force_mask, w_mask])
    reg = jnp.diag(1.0 - red_mask) + shift * jnp.eye(NU_RED, dtype=dtype)
    return p, Pu, Px, reg


def project_ocp(lq: LqProblem, stage: StageData, U, shift=1e-5,
                method: str = "chol", arm_locked: bool = False) -> ProjectedLq:
    """Apply force elimination + velocity-constraint projection to the LQ data.

    method: "chol" (Cholesky projector, TPU fast path, reduced dim 30) or
    "qr" (orthonormal padded basis, reduced dim 26). Both are exact; see
    tests/test_solver.py for the equivalence check. ``arm_locked`` (quad-only
    variant) is supported on the chol path only.
    """
    from .projection import project_node_chol, project_node_chol_ft

    N = U.shape[0]
    F_bar = U[:, 0:12]
    if U.shape[-1] == 36:
        # force-tracking problem: wrench block handled by the chol projector
        # only (the QR path stays 30-dim).
        p, Pu, Px, reg = jax.vmap(partial(project_node_chol_ft, shift=shift))(
            stage.contact_flags[:N], stage.grasp_flags[:N], F_bar,
            U[:, 30:36], lq.g0, lq.Gx, lq.Gv
        )
    elif arm_locked:
        if method != "chol":
            raise ValueError("arm_locked requires the chol projection")
        p, Pu, Px, reg = jax.vmap(
            partial(project_node_chol, shift=shift, arm_locked=True)
        )(
            stage.contact_flags[:N], F_bar, lq.g0, lq.Gx, lq.Gv,
            v_arm=U[:, 24:30],
        )
    else:
        node_fn = project_node_chol if method == "chol" else _project_node
        p, Pu, Px, reg = jax.vmap(partial(node_fn, shift=shift))(
            stage.contact_flags[:N], F_bar, lq.g0, lq.Gx, lq.Gv
        )

    return _apply_projection(lq, p, Pu, Px, reg)


def _apply_projection(lq: LqProblem, p, Pu, Px, reg) -> ProjectedLq:
    """Substitute du = p + Pu u_red + Px dx into dynamics and cost.

    Ellipsis einsums: works for per-scenario (N, ...) and batched (B, N, ...)
    LQ data alike.
    """
    A_bar = lq.A + lq.B @ Px
    B_bar = lq.B @ Pu
    d_bar = lq.d + jnp.einsum("...ij,...j->...i", lq.B, p)

    # Cost substitution du = p + Pu u + Px dx into
    #   1/2 dx'lxx dx + 1/2 du'luu du + du'lux dx + lx'dx + lu'du :
    lu_p = lq.lu + jnp.einsum("...ij,...j->...i", lq.luu, p)     # lu + luu p
    lx_bar = (
        lq.lx
        + jnp.einsum("...ui,...u->...i", Px, lu_p)               # Px^T (lu + luu p)
        + jnp.einsum("...ui,...u->...i", lq.lux, p)              # lux^T p
    )
    lu_bar = jnp.einsum("...ui,...u->...i", Pu, lu_p)
    PxT_lux = jnp.einsum("...ui,...ux->...ix", Px, lq.lux)       # Px^T lux
    lxx_bar = (
        lq.lxx
        + PxT_lux
        + jnp.swapaxes(PxT_lux, -1, -2)
        + jnp.einsum("...ui,...uv,...vx->...ix", Px, lq.luu, Px)
    )
    luu_bar = jnp.einsum("...ui,...uv,...vj->...ij", Pu, lq.luu, Pu) + reg
    lux_bar = jnp.einsum("...ui,...ux->...ix", Pu, lq.lux) + jnp.einsum(
        "...ui,...uv,...vx->...ix", Pu, lq.luu, Px
    )

    return ProjectedLq(
        A=A_bar, B=B_bar, d=d_bar,
        lx=lx_bar, lu=lu_bar, lxx=lxx_bar, luu=luu_bar, lux=lux_bar,
        lx_f=lq.lx_f, lxx_f=lq.lxx_f,
        p=p, Pu=Pu, Px=Px,
    )


def project_ocp_batched(lq: LqProblem, flags, U, shift=1e-5,
                        grasp=None, backend: str = "xla",
                        arm_locked: bool = False) -> ProjectedLq:
    """Batch-major Cholesky-projector projection over (B, N, ...) LQ data.

    Same math as projection.project_node_chol (+_ft), restructured so the
    single SPD solve runs as ONE batched (B*N, 12, 49) call — dispatched to
    the lanes-last Pallas kernel on TPU (backend="pallas"), where XLA's
    batched Cholesky is the measured hot spot (tools/microbench_ops.py).

    flags (B,N,4); U (B,N,nu); grasp (B,N) for the force-tracking problem.
    ``arm_locked`` (static, nu=30 only): quad-only variant — pins the
    arm-velocity inputs to zero (see projection.project_node_chol).
    """
    from ..models.spatial import fmm
    from ..ops.pallas_chol import spd_solve

    dtype = lq.g0.dtype
    B, N = flags.shape[0], flags.shape[1]
    nu = U.shape[-1]
    active = cons.velocity_row_mask(flags)                       # (B,N,12)
    eye12 = jnp.eye(NC_ROWS, dtype=dtype)
    if arm_locked:
        if nu != 30:
            raise ValueError("arm_locked requires the 30-input problem")
        col_mask = jnp.concatenate(
            [jnp.ones(12, dtype=dtype), jnp.zeros(6, dtype=dtype)])
        Gv_f = lq.Gv * col_mask
        p_lock_v = jnp.concatenate(
            [jnp.zeros((B, N, 12), dtype=dtype), -U[..., 24:30]], axis=-1)
        g0_eff = lq.g0 + jnp.einsum("...ia,...a->...i", lq.Gv, p_lock_v)
    else:
        col_mask = jnp.ones(NV_JOINTS, dtype=dtype)
        Gv_f = lq.Gv
        p_lock_v = jnp.zeros((B, N, NV_JOINTS), dtype=dtype)
        g0_eff = lq.g0
    GvT = jnp.swapaxes(Gv_f, -1, -2)                             # (B,N,18,12)
    # M = Gv Gv^T + diag(1 - active): the diagonal built by broadcast, not
    # scatter; fmm keeps the contraction inside the elementwise fusion
    # (a (B,N,12,18)x(B,N,18,12) dot_general pads to (8,128) MXU tiles)
    M = fmm(Gv_f, GvT) + (1.0 - active)[..., :, None] * eye12

    rhs = jnp.concatenate([g0_eff[..., None], lq.Gx, Gv_f], axis=-1)  # (B,N,12,49)
    if backend == "pallas":
        W = spd_solve(M.reshape(B * N, NC_ROWS, NC_ROWS),
                      rhs.reshape(B * N, NC_ROWS, -1))
        W = W.reshape(B, N, NC_ROWS, -1)
    else:
        def one(m, r):
            chol = jax.scipy.linalg.cho_factor(m)
            return jax.scipy.linalg.cho_solve(chol, r)

        W = jax.vmap(jax.vmap(one))(M, rhs)

    Minv_g0 = W[..., 0]                                          # (B,N,12)
    Minv_Gx = W[..., 1:1 + NX]                                   # (B,N,12,30)
    pinvT = W[..., 1 + NX:]                                      # (B,N,12,18) = M^-1 Gv_f

    du_part = p_lock_v - jnp.sum(Gv_f * Minv_g0[..., None], axis=-2)  # (B,N,18)
    Px_v = -fmm(GvT, Minv_Gx)                                    # (B,N,18,30)
    P = col_mask[:, None] * jnp.eye(NV_JOINTS, dtype=dtype) - fmm(GvT, pinvT)

    force_mask = jnp.repeat(flags, 3, axis=-1)                   # (B,N,12)
    F_bar = U[..., 0:12]
    p_F = -(1.0 - force_mask) * F_bar

    if nu == 36:
        g = grasp[..., None]                                     # (B,N,1)
        W_bar = U[..., 30:36]
        p = jnp.concatenate([p_F, du_part, -(1.0 - g) * W_bar], axis=-1)
    else:
        g = None
        p = jnp.concatenate([p_F, du_part], axis=-1)

    return _apply_projection_structured(
        lq, p, P, Px_v, force_mask, grasp=g, shift=shift)


def _apply_projection_structured(lq: LqProblem, p, P, Px_v, fm, grasp=None,
                                 shift=1e-5) -> ProjectedLq:
    """Blockwise du = p + Pu u_red + Px dx substitution for the batched path.

    Exploits Pu = blkdiag(diag(fm), P[, diag(g)]) and Px = [0; Px_v; 0]:
    the force (and wrench) blocks are elementwise column/row scalings and
    only the 18-dim joint-velocity block carries dense matmuls — vs the
    dense _apply_projection's (nu, nu) einsums PLUS materializing the
    (B, N, nu, nu) Pu/Px/reg maps (~0.5 GB of HBM traffic per batched solve
    at (512, 67) that this form never touches). Exactly the same math;
    tests/test_batched_sqp.py pins equivalence against vmap(sqp_iteration).

    p (B,N,nu); P (B,N,18,18); Px_v (B,N,18,30); fm (B,N,12);
    grasp (B,N,1) for the 36-input force-tracking problem.
    """
    from ..models.spatial import fmm, fmv

    dtype = lq.A.dtype
    nu = lq.B.shape[-1]
    PT = jnp.swapaxes(P, -1, -2)
    Px_vT = jnp.swapaxes(Px_v, -1, -2)

    B_F = lq.B[..., :, 0:12]
    B_v = lq.B[..., :, 12:30]
    A_bar = lq.A + fmm(B_v, Px_v)
    d_bar = lq.d + fmv(lq.B, p)

    lu_p = lq.lu + fmv(lq.luu, p)                                # lu + luu p
    lu_p_v = lu_p[..., 12:30]
    lux_v = lq.lux[..., 12:30, :]
    luu_Fv = lq.luu[..., 0:12, 12:30]
    luu_vv = lq.luu[..., 12:30, 12:30]

    lx_bar = (
        lq.lx
        + fmv(Px_vT, lu_p_v)                                     # Px^T (lu + luu p)
        + fmv(jnp.swapaxes(lq.lux, -1, -2), p)                   # lux^T p
    )
    PxT_lux = fmm(Px_vT, lux_v)                                  # Px^T lux
    lxx_bar = (
        lq.lxx
        + PxT_lux
        + jnp.swapaxes(PxT_lux, -1, -2)
        + fmm(Px_vT, fmm(luu_vv, Px_v))
    )

    # luu_bar / lux_bar / lu_bar / B_bar blockwise
    fm_col = fm[..., None, :]    # scale columns indexed by F
    fm_row = fm[..., :, None]    # scale rows indexed by F
    eye18 = jnp.eye(NV_JOINTS, dtype=dtype)
    eye12 = jnp.eye(12, dtype=dtype)

    luu_FF = lq.luu[..., 0:12, 0:12]
    FF_bar = fm_row * luu_FF * fm_col + (1.0 - fm[..., :, None]) * eye12
    Fv_bar = fm_row * fmm(luu_Fv, P)
    vv_bar = fmm(PT, fmm(luu_vv, P)) + (eye18 - P)
    lux_F_bar = fm_row * (lq.lux[..., 0:12, :] + fmm(luu_Fv, Px_v))
    lux_v_bar = fmm(PT, lux_v + fmm(luu_vv, Px_v))
    lu_bar_F = fm * lu_p[..., 0:12]
    lu_bar_v = fmv(PT, lu_p_v)
    B_bar_F = B_F * fm_col
    B_bar_v = fmm(B_v, P)

    if nu == 36:
        gc = grasp[..., None]                                    # (B,N,1,1)
        luu_FW = lq.luu[..., 0:12, 30:36]
        luu_vW = lq.luu[..., 12:30, 30:36]
        luu_WW = lq.luu[..., 30:36, 30:36]
        eye6 = jnp.eye(6, dtype=dtype)
        FW_bar = fm_row * luu_FW * gc
        vW_bar = fmm(PT, luu_vW) * gc
        WW_bar = gc * luu_WW * gc + (1.0 - gc) * eye6
        luu_bar = jnp.concatenate([
            jnp.concatenate([FF_bar, Fv_bar, FW_bar], -1),
            jnp.concatenate([jnp.swapaxes(Fv_bar, -1, -2), vv_bar, vW_bar], -1),
            jnp.concatenate([jnp.swapaxes(FW_bar, -1, -2),
                             jnp.swapaxes(vW_bar, -1, -2), WW_bar], -1),
        ], axis=-2) + shift * jnp.eye(36, dtype=dtype)
        lux_W_bar = grasp[..., None] * (
            lq.lux[..., 30:36, :]
            + fmm(jnp.swapaxes(luu_vW, -1, -2), Px_v)
        )
        lux_bar = jnp.concatenate([lux_F_bar, lux_v_bar, lux_W_bar], axis=-2)
        lu_bar = jnp.concatenate(
            [lu_bar_F, lu_bar_v, grasp * lu_p[..., 30:36]], axis=-1)
        B_bar = jnp.concatenate(
            [B_bar_F, B_bar_v, lq.B[..., :, 30:36] * gc], axis=-1)
    else:
        luu_bar = jnp.concatenate([
            jnp.concatenate([FF_bar, Fv_bar], -1),
            jnp.concatenate([jnp.swapaxes(Fv_bar, -1, -2), vv_bar], -1),
        ], axis=-2) + shift * jnp.eye(nu, dtype=dtype)
        lux_bar = jnp.concatenate([lux_F_bar, lux_v_bar], axis=-2)
        lu_bar = jnp.concatenate([lu_bar_F, lu_bar_v], axis=-1)
        B_bar = jnp.concatenate([B_bar_F, B_bar_v], axis=-1)

    return ProjectedLq(
        A=A_bar, B=B_bar, d=d_bar,
        lx=lx_bar, lu=lu_bar, lxx=lxx_bar, luu=luu_bar, lux=lux_bar,
        lx_f=lq.lx_f, lxx_f=lq.lxx_f,
        p=p, Pu=None, Px=None,
        P=P, Px_v=Px_v, force_mask=fm,
        grasp_gate=None if grasp is None else grasp,
    )
