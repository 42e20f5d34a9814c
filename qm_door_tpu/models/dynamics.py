"""Rigid-body dynamics quantities (pure JAX, single-sample; vmap to batch).

Replaces pinocchio crba / nonLinearEffects / computeCentroidalMap(ccrba) /
dccrba as used by the reference WBC and the OCS2 centroidal model
(qm_wbc/src/WbcBase.cpp:160-237, ocs2_centroidal_model ModelHelperFunctions).

Formulation notes (chosen for XLA/MXU friendliness instead of the recursive
CPU-style algorithms):

- Mass matrix from the kinetic-energy identity
      M(q) = sum_i [ m_i Jc_i^T Jc_i + Jw_i^T I_i^w Jw_i ]
  over all 19 lumped bodies, where Jc_i/Jw_i are world-aligned com-point
  Jacobians. This is a batch of small matmuls — exactly what the MXU wants —
  and is exact in any generalized-coordinate chart.
- Nonlinear effects from the Lagrangian identity
      h(q, v) = Mdot v - d/dq (1/2 v^T M v) + g(q)
  computed with jvp/grad instead of a hand-written RNEA.
- Centroidal momentum matrix (CMM) about the robot com, world axes:
      A_lin = sum_i m_i Jc_i,
      A_ang = sum_i [ I_i^w Jw_i + m_i skew(c_i - c) Jc_i ]
  (Orin/Wensing construction); Adot via jvp.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from . import spatial
from .kinematics import fk, joint_world_axes, point_jacobian
from .model import RobotModel, GRAVITY


def body_com_kinematics(model: RobotModel, q):
    """World com positions (19,3), world inertias about com (19,3,3),
    and com-point Jacobians (19,6,24)."""
    axes, origins, (R, p) = joint_world_axes(model, q)
    coms = jnp.einsum("bij,bj->bi", R, model.body_com) + p
    Iw = jnp.einsum("bij,bjk,blk->bil", R, model.body_inertia, R)
    Js = []
    for b in range(model.nj + 1):
        Js.append(point_jacobian(model, q, b, coms[b], (axes, origins)))
    return coms, Iw, jnp.stack(Js)


@jax.jit
def mass_matrix(model: RobotModel, q):
    """24x24 joint-space mass matrix (crba equivalent, exact)."""
    coms, Iw, J = body_com_kinematics(model, q)
    Jlin, Jang = J[:, :3, :], J[:, 3:, :]
    m = model.body_mass[:, None, None]
    M = jnp.einsum("bki,bkj->ij", Jlin * m, Jlin) + jnp.einsum(
        "bki,bkl,blj->ij", Jang, Iw, Jang
    )
    return 0.5 * (M + M.T)


@jax.jit
def potential_energy(model: RobotModel, q):
    R, p = fk(model, q)
    coms = jnp.einsum("bij,bj->bi", R, model.body_com) + p
    return GRAVITY * jnp.sum(model.body_mass * coms[:, 2])


@jax.jit
def gravity_vector(model: RobotModel, q):
    return jax.grad(partial(potential_energy, model))(q)


@jax.jit
def nonlinear_effects(model: RobotModel, q, v):
    """h(q,v) = C(q,v)v + g(q)  (pinocchio nonLinearEffects equivalent)."""
    Mfun = partial(mass_matrix, model)
    M, Mdot = jax.jvp(Mfun, (q,), (v,))
    kinetic_grad = jax.grad(lambda qq: 0.5 * v @ mass_matrix(model, qq) @ v)(q)
    return Mdot @ v - kinetic_grad + gravity_vector(model, q)


@jax.jit
def com_position(model: RobotModel, q):
    R, p = fk(model, q)
    coms = jnp.einsum("bij,bj->bi", R, model.body_com) + p
    return jnp.sum(model.body_mass[:, None] * coms, axis=0) / jnp.sum(model.body_mass)


from functools import lru_cache


@lru_cache(maxsize=None)
def _subtree_table(joint_parent: tuple):
    """(nj, nb) static 0/1 table: body b is in the subtree of joint j."""
    import numpy as np

    nj = len(joint_parent)
    table = np.zeros((nj, nj + 1), dtype=bool)
    for i in range(nj):
        b = 1 + i
        j = i
        while True:
            table[j, b] = True
            parent_body = joint_parent[j]
            if parent_body == 0:
                break
            j = parent_body - 1
    return table


@lru_cache(maxsize=None)
def _reverse_topological(joint_parent: tuple):
    """Body indices 1..nb-1 ordered leaves-first (child before parent).

    URDF joint order gives parent_body < child_body, so descending index is
    a valid reverse-topological order; assert the invariant statically.
    """
    nj = len(joint_parent)
    for i in range(nj):
        assert joint_parent[i] < 1 + i, "joint order must place parents first"
    return tuple(range(nj, 0, -1))


@jax.jit
def centroidal_momentum_matrix(model: RobotModel, q):
    """6x24 CMM A(q): h = A v, h = [linear momentum; angular momentum about
    the com], world axes (pinocchio ccrba / computeCentroidalMap equivalent).

    CCRBA-style assembly from subtree aggregates (mass, first moment, inertia
    about the world origin) instead of stacked per-body 6x24 Jacobians — the
    peak intermediate is (19,3,3), which keeps jacfwd through the flow map
    ~16x leaner in memory (critical for large scenario batches).
    """
    from .kinematics import joint_world_axes

    axes, origins, (R, p) = joint_world_axes(model, q)
    return cmm_from_fk(model, q, axes, origins, R, p)


def cmm_from_fk(model: RobotModel, q, axes, origins, R, p):
    """CMM assembly from precomputed FK (shared-FK fast path for the flow map)."""
    m = model.body_mass
    coms = spatial.fmv(R, model.body_com) + p                       # (19,3)
    Iw = spatial.fmm(
        spatial.fmm(R, model.body_inertia), jnp.swapaxes(R, -1, -2)
    )                                                               # (19,3,3)
    eye = jnp.eye(3, dtype=q.dtype)
    # per-body inertia about the world origin
    cc = jnp.sum(coms * coms, axis=-1)
    I_origin = Iw + m[:, None, None] * (
        cc[:, None, None] * eye - coms[:, :, None] * coms[:, None, :]
    )
    s_body = m[:, None] * coms                                      # (19,3)

    # Subtree aggregates by suffix accumulation along the tree (leaves-first,
    # statically unrolled). The one-liner this replaces —
    #   jnp.sum(table[:, :, None, None] * I_origin[None], axis=1)
    # — materializes an (18, 19, 3, 3) outer product PER AD TANGENT in the
    # solver's 24-tangent linearization (~1/3 of the linearize stage's FLOPs
    # and a multi-GB HBM intermediate at production batch); the chain sum is
    # O(n_bodies) adds with the same result.
    parents = tuple(model.joint_parent)
    nj = len(parents)
    sub_m = [m[b] for b in range(nj + 1)]
    sub_s = [s_body[b] for b in range(nj + 1)]
    sub_J = [I_origin[b] for b in range(nj + 1)]
    for b in _reverse_topological(parents):
        pb = parents[b - 1]  # parent body of body b (joint b-1 connects them)
        if pb != 0:          # joint aggregates never need the base body's row
            sub_m[pb] = sub_m[pb] + sub_m[b]
            sub_s[pb] = sub_s[pb] + sub_s[b]
            sub_J[pb] = sub_J[pb] + sub_J[b]
    M_sub = jnp.stack([sub_m[1 + j] for j in range(nj)])            # (18,)
    s_sub = jnp.stack([sub_s[1 + j] for j in range(nj)])            # (18,3)
    J_sub = jnp.stack([sub_J[1 + j] for j in range(nj)])            # (18,3,3)

    # joint columns about the origin
    lever = s_sub - M_sub[:, None] * origins                        # (18,3)
    P_cols = jnp.cross(axes, lever)                                 # (18,3)
    so = jnp.sum(s_sub * origins, axis=-1)
    L_cols = (
        spatial.fmv(J_sub, axes)
        - so[:, None] * axes
        + origins * jnp.sum(s_sub * axes, axis=-1)[:, None]
    )

    # base columns: translation then euler-rate rotation about base origin
    M_tot = jnp.sum(m)
    s_tot = jnp.sum(s_body, axis=0)
    J_tot = jnp.sum(I_origin, axis=0)
    E = spatial.zyx_rates_to_world_angvel_matrix(q[3:6])            # (3,3)
    base_p = q[0:3]
    P_rot = jnp.cross(
        E.T, (s_tot - M_tot * base_p)[None, :]
    )                                                               # (3,3) rows per col
    so_b = jnp.dot(s_tot, base_p)
    L_rot = (
        spatial.fmm(E.T, J_tot.T)
        - so_b * E.T
        + base_p[None, :] * spatial.fmv(E.T, s_tot)[:, None]
    )

    P = jnp.concatenate(
        [M_tot * eye, P_rot.T, P_cols.T], axis=1
    )                                                               # (3,24)
    L_O = jnp.concatenate([spatial.skew(s_tot), L_rot.T, L_cols.T], axis=1)
    # shift momentum reference from world origin to the com
    com = s_tot / M_tot
    L = L_O - spatial.fmm(spatial.skew(com), P)
    return jnp.concatenate([P, L], axis=0)


@jax.jit
def centroidal_momentum_matrix_dot(model: RobotModel, q, v):
    """dA/dt along qdot = v (pinocchio dccrba equivalent)."""
    _, Adot = jax.jvp(partial(centroidal_momentum_matrix, model), (q,), (v,))
    return Adot


@jax.jit
def centroidal_momentum(model: RobotModel, q, v):
    return centroidal_momentum_matrix(model, q) @ v


@jax.jit
def kinetic_energy(model: RobotModel, q, v):
    return 0.5 * v @ mass_matrix(model, q) @ v


@jax.jit
def inverse_dynamics(model: RobotModel, q, v, a):
    """tau = M(q) a + h(q, v) — generalized forces for a given acceleration."""
    return mass_matrix(model, q) @ a + nonlinear_effects(model, q, v)


@jax.jit
def forward_dynamics(model: RobotModel, q, v, tau_gen):
    """a = M^{-1}(tau_gen - h): unconstrained forward dynamics.

    ``tau_gen`` is the full 24-dim generalized force (base wrench rows included;
    contact forces must already be mapped through J^T by the caller).
    """
    M = mass_matrix(model, q)
    h = nonlinear_effects(model, q, v)
    return jnp.linalg.solve(M, tau_gen - h)
