"""Cholesky-projector equality projection (TPU fast path).

Equivalent to the QR-based projection in transcription._project_node but with
only Cholesky/matmul primitives (no QR/SVD — both are slow on TPU):

- M = Gv Gv^T + diag(1 - active_rows) is SPD and *exactly* invertible: masked
  rows of Gv are identically zero, so M is block-diagonal between the active
  block (full row rank generically) and an identity block; hence
  Gv^+ = Gv^T M^-1 is the exact pseudo-inverse of the active rows.
- The null space is represented by the orthogonal projector
  P = I - Gv^+ Gv (18x18) instead of a basis: reduced input
  u_red = [dF_tilde (12); w (18)] with w acting through P. Directions in
  range(Gv^T) are pinned to zero by the (I - P) Hessian regularizer — same
  padded-dimension trick as the basis form, but rank handling is implicit.

Reduced input dim: 12 + 18 = 30.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ocp import constraints as cons

NX = 30
NU = 30
NU_RED_PROJ = 30


def project_node_chol(flags, F_bar, g0, Gx, Gv, shift, v_arm=None,
                      arm_locked: bool = False):
    """du = p + Pu u_red + Px dx with u_red in R^30. Returns (p, Pu, Px, reg).

    ``arm_locked`` (static): the quadruped-only variant (BASELINE config #1,
    reference ModelSettings.h:147-153 leg-only joint set) as an input-space
    equality u_arm = 0 — the arm-velocity delta is pinned to -v_arm (``v_arm``
    = current arm joint velocities u_bar[24:30]), the velocity constraint is
    re-solved over the 12 leg columns only, and the arm's reduced dims are
    identity-regularized. Fixed shapes throughout (a mask, not a shape
    change — the framework's mode-switching rule)."""
    dtype = g0.dtype
    active = cons.velocity_row_mask(flags)                  # (12,)
    if arm_locked:
        col_mask = jnp.concatenate(
            [jnp.ones(12, dtype=dtype), jnp.zeros(6, dtype=dtype)])
        Gv_f = Gv * col_mask[None, :]
        p_lock = jnp.concatenate([jnp.zeros(12, dtype=dtype), -v_arm])
        g0_eff = g0 + Gv @ p_lock
    else:
        col_mask = jnp.ones(18, dtype=dtype)
        Gv_f = Gv
        p_lock = jnp.zeros(18, dtype=dtype)
        g0_eff = g0
    M = Gv_f @ Gv_f.T + jnp.diag(1.0 - active)
    chol = jax.scipy.linalg.cho_factor(M)
    pinvT = jax.scipy.linalg.cho_solve(chol, Gv_f)          # (12,18) = M^-1 Gv_f
    GvPinv = pinvT.T                                        # (18,12) = Gv_f^+

    du_part = p_lock - GvPinv @ g0_eff                      # (18,)
    Px_v = -GvPinv @ Gx                                     # (18,30)
    P = jnp.diag(col_mask) - GvPinv @ Gv_f                  # (18,18) projector

    force_mask = jnp.repeat(flags, 3)                       # (12,) 1 = stance
    p = jnp.concatenate([-(1.0 - force_mask) * F_bar, du_part])

    Pu = jnp.zeros((NU, NU_RED_PROJ), dtype=dtype)
    Pu = Pu.at[0:12, 0:12].set(jnp.diag(force_mask))
    Pu = Pu.at[12:30, 12:30].set(P)
    Px = jnp.zeros((NU, NX), dtype=dtype)
    Px = Px.at[12:30, :].set(Px_v)

    reg = jnp.zeros((NU_RED_PROJ, NU_RED_PROJ), dtype=dtype)
    reg = reg.at[0:12, 0:12].set(jnp.diag(1.0 - force_mask))
    reg = reg.at[12:30, 12:30].set(jnp.eye(18, dtype=dtype) - P)
    reg = reg + shift * jnp.eye(NU_RED_PROJ, dtype=dtype)
    return p, Pu, Px, reg


def project_node_chol_ft(flags, grasp, F_bar, W_bar, g0, Gx, Gv, shift):
    """Force-tracking variant: u (36) = [F (12); v_j (18); W_ee (6)].

    The EE wrench is eliminated exactly like swing-foot forces: when the
    grasp flag is 0 the wrench delta is pinned to -W_bar (zero wrench in the
    plan) and its reduced dims are identity-regularized; when grasping the
    wrench is a free tracked input. Reduced input dim 36.
    """
    dtype = g0.dtype
    p0, Pu0, Px0, reg0 = project_node_chol(flags, F_bar, g0, Gx, Gv, 0.0)
    g = grasp.astype(dtype)
    eye6 = jnp.eye(6, dtype=dtype)

    p = jnp.concatenate([p0, -(1.0 - g) * W_bar])
    Pu = jnp.zeros((36, 36), dtype=dtype)
    Pu = Pu.at[0:30, 0:30].set(Pu0)
    Pu = Pu.at[30:36, 30:36].set(g * eye6)
    Px = jnp.concatenate([Px0, jnp.zeros((6, NX), dtype=dtype)], axis=0)
    reg = jnp.zeros((36, 36), dtype=dtype)
    reg = reg.at[0:30, 0:30].set(reg0)
    reg = reg.at[30:36, 30:36].set((1.0 - g) * eye6)
    reg = reg + shift * jnp.eye(36, dtype=dtype)
    return p, Pu, Px, reg
