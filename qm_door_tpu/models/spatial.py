"""Spatial algebra / rotation utilities (pure JAX, dtype-polymorphic, vmappable).

Conventions (matching the reference stack's generalized-coordinate layout,
see /root/reference qm_controllers/config/task.info:151-190 and the OCS2
centroidal model it builds on):

- Base orientation is parametrized by ZYX Euler angles ``(z, y, x)`` =
  (yaw, pitch, roll); the rotation matrix is ``R = Rz(z) @ Ry(y) @ Rx(x)``
  mapping base-frame vectors into world frame.
- The floating-base generalized velocity uses the *Euler-rate* chart:
  ``v_base = [v_world(3); zyx_rates(3)]`` — the same chart OCS2/pinocchio use
  for the composite translation+sphericalZYX free-flyer joint, so Jacobians
  and mass matrices are directly comparable.
"""
from __future__ import annotations

import jax.numpy as jnp


def fmm(A, B):
    """Small-matrix matmul as broadcast-multiply-sum.

    TPU: a (3,3)-ish dot_general lowers to its own padded kernel ((8,128)
    tiles) and breaks XLA fusion; writing the contraction as multiply+sum
    keeps the whole FK/CMM chain one fused elementwise DAG. Use for any
    matmul whose contracted dim is tiny (<= ~32)."""
    return jnp.sum(A[..., :, :, None] * B[..., None, :, :], axis=-2)


def fmv(A, x):
    """Small matrix-vector product as multiply+sum (see fmm)."""
    return jnp.sum(A * x[..., None, :], axis=-1)


def inv3(M):
    """Adjugate inverse of a (batched) 3x3 matrix — pure elementwise ops.

    TPU: XLA lowers a batched ``jnp.linalg.solve`` to an LU kernel whose
    marginal cost at (B*N, 6, 6) dwarfs the surrounding fused elementwise
    chain (the same pathology as the batched Cholesky, see
    solver/riccati.py); Cramer's rule keeps the inverse inside the fusion.
    Intended for well-conditioned physical matrices (inertia blocks, Euler
    kinematics maps), where cond * eps(f32) stays far below solver
    tolerances."""
    a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    d, e, f = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    g, h, i = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    A = e * i - f * h
    B = -(d * i - f * g)
    C = d * h - e * g
    det = a * A + b * B + c * C
    adjT = jnp.stack(
        [
            jnp.stack([A, -(b * i - c * h), b * f - c * e], axis=-1),
            jnp.stack([B, a * i - c * g, -(a * f - c * d)], axis=-1),
            jnp.stack([C, -(a * h - b * g), a * e - b * d], axis=-1),
        ],
        axis=-2,
    )
    return adjT / det[..., None, None]


def solve6_block(A6, rhs):
    """Solve ``A6 @ x = rhs`` for a (batched) 6x6 block matrix via the Schur
    complement of the top-left 3x3 block, using :func:`inv3` — the whole
    solve stays elementwise/fusable (no batched LU kernel).

    ``A6`` (..., 6, 6); ``rhs`` (..., 6) or (..., 6, k). Built for the CMM
    base block A_b (top-left = M_tot * I3, Schur complement = locked angular
    inertia composed with the Euler-rate map — both well-conditioned for a
    physical robot away from pitch +-pi/2)."""
    vec = rhs.ndim == A6.ndim - 1
    r = rhs[..., None] if vec else rhs
    P, B = A6[..., 0:3, 0:3], A6[..., 0:3, 3:6]
    C, D = A6[..., 3:6, 0:3], A6[..., 3:6, 3:6]
    Pi = inv3(P)
    CPi = fmm(C, Pi)
    S = D - fmm(CPi, B)
    r1, r2 = r[..., 0:3, :], r[..., 3:6, :]
    y2 = fmm(inv3(S), r2 - fmm(CPi, r1))
    y1 = fmm(Pi, r1 - fmm(B, y2))
    out = jnp.concatenate([y1, y2], axis=-2)
    return out[..., 0] if vec else out


def skew(v):
    """Cross-product matrix: skew(v) @ u == cross(v, u). Batched over leading dims."""
    z = jnp.zeros_like(v[..., 0])
    return jnp.stack(
        [
            jnp.stack([z, -v[..., 2], v[..., 1]], axis=-1),
            jnp.stack([v[..., 2], z, -v[..., 0]], axis=-1),
            jnp.stack([-v[..., 1], v[..., 0], z], axis=-1),
        ],
        axis=-2,
    )


def rot_x(a):
    c, s = jnp.cos(a), jnp.sin(a)
    o, z = jnp.ones_like(a), jnp.zeros_like(a)
    return jnp.stack(
        [
            jnp.stack([o, z, z], axis=-1),
            jnp.stack([z, c, -s], axis=-1),
            jnp.stack([z, s, c], axis=-1),
        ],
        axis=-2,
    )


def rot_y(a):
    c, s = jnp.cos(a), jnp.sin(a)
    o, z = jnp.ones_like(a), jnp.zeros_like(a)
    return jnp.stack(
        [
            jnp.stack([c, z, s], axis=-1),
            jnp.stack([z, o, z], axis=-1),
            jnp.stack([-s, z, c], axis=-1),
        ],
        axis=-2,
    )


def rot_z(a):
    c, s = jnp.cos(a), jnp.sin(a)
    o, z = jnp.ones_like(a), jnp.zeros_like(a)
    return jnp.stack(
        [
            jnp.stack([c, -s, z], axis=-1),
            jnp.stack([s, c, z], axis=-1),
            jnp.stack([z, z, o], axis=-1),
        ],
        axis=-2,
    )


def rpy_to_rot(rpy):
    """URDF fixed-axis roll-pitch-yaw -> rotation matrix: Rz(y)Ry(p)Rx(r)."""
    return fmm(fmm(rot_z(rpy[..., 2]), rot_y(rpy[..., 1])), rot_x(rpy[..., 0]))


def zyx_to_rot(zyx):
    """ZYX Euler angles (yaw, pitch, roll) -> rotation matrix Rz Ry Rx."""
    return fmm(fmm(rot_z(zyx[..., 0]), rot_y(zyx[..., 1])), rot_x(zyx[..., 2]))


def rot_to_zyx(R):
    """Rotation matrix -> ZYX Euler angles (yaw, pitch, roll).

    Inverse of :func:`zyx_to_rot` away from the pitch = +-pi/2 singularity.
    """
    yaw = jnp.arctan2(R[..., 1, 0], R[..., 0, 0])
    pitch = jnp.arctan2(-R[..., 2, 0], jnp.hypot(R[..., 2, 1], R[..., 2, 2]))
    roll = jnp.arctan2(R[..., 2, 1], R[..., 2, 2])
    return jnp.stack([yaw, pitch, roll], axis=-1)


def zyx_rates_to_world_angvel_matrix(zyx):
    """E(zyx) with omega_world = E @ d/dt(zyx).

    omega = zdot * e_z + Rz(z) (ydot * e_y) + Rz(z) Ry(y) (xdot * e_x)
    (mirrors ocs2 getGlobalAngularVelocityFromEulerAnglesZyxDerivatives).
    """
    z, y = zyx[..., 0], zyx[..., 1]
    cz, sz = jnp.cos(z), jnp.sin(z)
    cy, sy = jnp.cos(y), jnp.sin(y)
    zero = jnp.zeros_like(z)
    one = jnp.ones_like(z)
    # columns: e_z | Rz e_y | Rz Ry e_x
    col0 = jnp.stack([zero, zero, one], axis=-1)
    col1 = jnp.stack([-sz, cz, zero], axis=-1)
    col2 = jnp.stack([cz * cy, sz * cy, -sy], axis=-1)
    return jnp.stack([col0, col1, col2], axis=-1)


def world_angvel_to_zyx_rates(zyx, omega_world):
    """Inverse chart map: d/dt(zyx) = E(zyx)^-1 omega_world (analytic inverse;
    singular at pitch = +-pi/2 like every ZYX chart)."""
    z, y = zyx[..., 0], zyx[..., 1]
    cz, sz = jnp.cos(z), jnp.sin(z)
    cy, sy = jnp.cos(y), jnp.sin(y)
    inv_cy = 1.0 / cy
    row0 = jnp.stack([cz * sy * inv_cy, sz * sy * inv_cy, jnp.ones_like(z)], axis=-1)
    row1 = jnp.stack([-sz, cz, jnp.zeros_like(z)], axis=-1)
    row2 = jnp.stack([cz * inv_cy, sz * inv_cy, jnp.zeros_like(z)], axis=-1)
    Einv = jnp.stack([row0, row1, row2], axis=-2)
    return fmv(Einv, omega_world)


def zyx_rates_to_world_angvel(zyx, zyx_rates):
    return fmv(zyx_rates_to_world_angvel_matrix(zyx), zyx_rates)


def world_angacc_from_zyx(zyx, zyx_rates, zyx_rates_dot):
    """omega_dot_world = E zyxddot + Edot zyxdot (ocs2
    getGlobalAngularAccelerationFromEulerAnglesZyxDerivatives equivalent)."""
    import jax

    E_fn = zyx_rates_to_world_angvel_matrix
    E, Edot = jax.jvp(E_fn, (zyx,), (zyx_rates,))
    return fmv(E, zyx_rates_dot) + fmv(Edot, zyx_rates)


# ---------------------------------------------------------------------------
# Quaternions (xyzw order, matching Eigen's .coeffs() used by the reference).
# ---------------------------------------------------------------------------

def quat_to_rot(q_xyzw):
    x, y, z, w = (q_xyzw[..., 0], q_xyzw[..., 1], q_xyzw[..., 2], q_xyzw[..., 3])
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)], axis=-1),
            jnp.stack([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)], axis=-1),
            jnp.stack([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)], axis=-1),
        ],
        axis=-2,
    )


def rot_to_quat(R):
    """Rotation matrix -> quaternion (xyzw), robust branchless (Shepperd)."""
    m00, m11, m22 = R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]
    tr = m00 + m11 + m22
    # Four candidate constructions; pick the numerically best by largest pivot.
    qw0 = jnp.sqrt(jnp.clip(1.0 + tr, 1e-12, None)) / 2.0
    qx1 = jnp.sqrt(jnp.clip(1.0 + m00 - m11 - m22, 1e-12, None)) / 2.0
    qy2 = jnp.sqrt(jnp.clip(1.0 - m00 + m11 - m22, 1e-12, None)) / 2.0
    qz3 = jnp.sqrt(jnp.clip(1.0 - m00 - m11 + m22, 1e-12, None)) / 2.0

    c0 = jnp.stack(
        [
            (R[..., 2, 1] - R[..., 1, 2]) / (4 * qw0),
            (R[..., 0, 2] - R[..., 2, 0]) / (4 * qw0),
            (R[..., 1, 0] - R[..., 0, 1]) / (4 * qw0),
            qw0,
        ],
        axis=-1,
    )
    c1 = jnp.stack(
        [
            qx1,
            (R[..., 0, 1] + R[..., 1, 0]) / (4 * qx1),
            (R[..., 0, 2] + R[..., 2, 0]) / (4 * qx1),
            (R[..., 2, 1] - R[..., 1, 2]) / (4 * qx1),
        ],
        axis=-1,
    )
    c2 = jnp.stack(
        [
            (R[..., 0, 1] + R[..., 1, 0]) / (4 * qy2),
            qy2,
            (R[..., 1, 2] + R[..., 2, 1]) / (4 * qy2),
            (R[..., 0, 2] - R[..., 2, 0]) / (4 * qy2),
        ],
        axis=-1,
    )
    c3 = jnp.stack(
        [
            (R[..., 0, 2] + R[..., 2, 0]) / (4 * qz3),
            (R[..., 1, 2] + R[..., 2, 1]) / (4 * qz3),
            qz3,
            (R[..., 1, 0] - R[..., 0, 1]) / (4 * qz3),
        ],
        axis=-1,
    )
    pivots = jnp.stack([tr, m00 - m11 - m22, -m00 + m11 - m22, -m00 - m11 + m22], axis=-1)
    idx = jnp.argmax(pivots, axis=-1)
    cands = jnp.stack([c0, c1, c2, c3], axis=-2)
    return jnp.take_along_axis(cands, idx[..., None, None], axis=-2)[..., 0, :]


def quat_mul(a, b):
    """Hamilton product (xyzw)."""
    ax, ay, az, aw = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bx, by, bz, bw = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
            aw * bw - ax * bx - ay * by - az * bz,
        ],
        axis=-1,
    )


def quat_conj(q):
    return jnp.concatenate([-q[..., :3], q[..., 3:]], axis=-1)


def quat_slerp(qa, qb, t):
    """Spherical interpolation from qa (t=0) to qb (t=1), shortest arc."""
    dot = jnp.sum(qa * qb, axis=-1, keepdims=True)
    qb = jnp.where(dot < 0, -qb, qb)
    dot = jnp.abs(dot)
    dot = jnp.clip(dot, -1.0, 1.0)
    theta = jnp.arccos(jnp.clip(dot, 0.0, 1.0 - 1e-9))
    sin_theta = jnp.sin(theta)
    small = sin_theta < 1e-6
    wa = jnp.where(small, 1.0 - t, jnp.sin((1.0 - t) * theta) / jnp.where(small, 1.0, sin_theta))
    wb = jnp.where(small, t, jnp.sin(t * theta) / jnp.where(small, 1.0, sin_theta))
    out = wa * qa + wb * qb
    return out / jnp.linalg.norm(out, axis=-1, keepdims=True)


def quat_log3(q_xyzw):
    """SO(3) log map of a quaternion -> rotation vector (angle*axis)."""
    v = q_xyzw[..., :3]
    w = q_xyzw[..., 3]
    nv = jnp.linalg.norm(v, axis=-1)
    angle = 2.0 * jnp.arctan2(nv, jnp.abs(w))
    sign = jnp.where(w < 0, -1.0, 1.0)
    scale = jnp.where(nv < 1e-9, 2.0 * sign, sign * angle / jnp.where(nv < 1e-9, 1.0, nv))
    return v * scale[..., None]


def rotation_error_world(R_ref, R_meas):
    """World-frame rotation error log(R_ref @ R_meas^T) as a rotation vector.

    Matches ocs2 rotationErrorInWorld used by the reference WBC
    (qm_wbc/src/WbcBase.cpp base/EE angular tasks).
    """
    return log3(fmm(R_ref, jnp.swapaxes(R_meas, -1, -2)))


def log3(R):
    """SO(3) log map of a rotation matrix -> rotation vector."""
    return quat_log3(rot_to_quat(R))


def quat_distance(qa, qb):
    """Rotation-vector distance between two quaternions."""
    return quat_log3(quat_mul(qb, quat_conj(qa)))


def quat_error_ocs2(q, q_ref):
    """ocs2 quaternionDistance(q, qRef) = w qRef.vec - wRef q.vec + q.vec x qRef.vec.

    The orientation-error measure used by PinocchioEndEffectorKinematics::
    getOrientationError (EE soft constraint in the MPC cost). ~ axis*sin(angle/2)
    for small errors; zero iff q == qRef.
    """
    return (
        q[..., 3:4] * q_ref[..., :3]
        - q_ref[..., 3:4] * q[..., :3]
        + jnp.cross(q[..., :3], q_ref[..., :3])
    )
