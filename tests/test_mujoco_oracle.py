"""Cross-engine oracle: the JAX model core vs MuJoCo loading the SAME URDF.

Every other correctness artifact in this repo is self-referential (finite
differences, our own f64, recorded self-traces).  This module is the external
oracle: MuJoCo 3.x parses the reference URDF independently
(/root/reference/qm_description/urdf/quadruped_manipulator/robot.urdf — the
model pinned by qm_interface/src/QMInterface.cpp:410-416 and consumed through
pinocchio at qm_wbc/src/WbcBase.cpp:146-203) and we assert f64 agreement of

  - FK frame placements (feet, EE, base)            vs data.xpos/xmat
  - LOCAL_WORLD_ALIGNED frame Jacobians (+ dJ/dt)   vs mj_jac / mj_jacDot
  - joint-space mass matrix  M(q)                   vs mj_fullM
  - bias forces h(q,v) and full inverse dynamics    vs mj_inverse
  - unconstrained forward dynamics                  vs mj_forward qacc
  - CoM, centroidal momentum [lin; ang about com]   vs mj_subtreeVel

Coordinate bridge: our generalized velocity is v = [v_base^world(3);
ZYX euler rates(3); qdot_j(18)] while MuJoCo's free joint uses
[v_base^world(3); omega^body(3)].  With S(q) mapping ours -> MuJoCo's
(S = blkdiag(I, R^T E(zyx), P_joints), E = euler-rate -> world-angvel map):

    qvel_mj = S v,   qacc_mj = S a + dS/dt v,   M_ours = S^T M_mj S,
    tau_ours = S^T tau_mj.

MuJoCo re-diagonalizes body inertias into principal axes at compile time, so
agreement bottoms out at ~1e-9 relative (NOT exactly 0); tolerances below sit
just above that floor.  Gripper joint is welded at 0 (same reduction the
OCS2 CentroidalModelInfo applies by listing only the 18 actuated joints).
"""
import os
import xml.etree.ElementTree as ET

import numpy as np
import pytest

mujoco = pytest.importorskip("mujoco")

import jax
import jax.numpy as jnp

from qm_door_tpu.models import aliengo_z1, dynamics, kinematics, spatial
from qm_door_tpu.models.model import JOINT_NAMES

REF_URDF = "/root/reference/qm_description/urdf/quadruped_manipulator/robot.urdf"

FRAMES = ("LF_FOOT", "RF_FOOT", "LH_FOOT", "RH_FOOT", "z1_end_effector", "base")


def _preprocess_urdf(src, dst):
    """Strip meshes/gazebo/transmissions; weld the gripper at 0.

    MuJoCo's URDF importer would otherwise chase package:// mesh URIs; the
    inertial and kinematic content (all we compare) is untouched.
    """
    tree = ET.parse(src)
    root = tree.getroot()
    for link in root.findall("link"):
        for tag in ("visual", "collision"):
            for el in link.findall(tag):
                link.remove(el)
    for el in list(root):
        if el.tag in ("gazebo", "transmission"):
            root.remove(el)
    for j in root.findall("joint"):
        if j.get("name") == "z1_joint_Gripper":
            j.set("type", "fixed")
            for tag in ("axis", "limit", "dynamics"):
                e = j.find(tag)
                if e is not None:
                    j.remove(e)
    tree.write(dst)


@pytest.fixture(scope="module")
def mj(tmp_path_factory):
    if not os.path.exists(REF_URDF):
        pytest.skip("reference URDF not mounted")
    urdf = str(tmp_path_factory.mktemp("mjc") / "qm.urdf")
    _preprocess_urdf(REF_URDF, urdf)
    spec = mujoco.MjSpec.from_file(urdf)
    spec.compiler.fusestatic = False  # keep fixed-joint foot/EE bodies as frames
    spec.body("base").add_freejoint()
    m = spec.compile()
    m.opt.gravity[:] = (0.0, 0.0, -9.81)
    # The oracle compares smooth dynamics only: no contacts exist (no geoms),
    # and limit/friction/damping constraint forces must not leak into
    # qfrc_inverse for out-of-limit random configurations.
    m.opt.disableflags |= (
        mujoco.mjtDisableBit.mjDSBL_CONSTRAINT
        | mujoco.mjtDisableBit.mjDSBL_CONTACT
        | mujoco.mjtDisableBit.mjDSBL_LIMIT
    )
    m.dof_damping[:] = 0.0
    m.dof_frictionloss[:] = 0.0
    d = mujoco.MjData(m)
    jid = [mujoco.mj_name2id(m, mujoco.mjtObj.mjOBJ_JOINT, n) for n in JOINT_NAMES]
    assert all(i >= 0 for i in jid), "joint name mismatch vs URDF"
    dofmap = np.array([m.jnt_dofadr[i] for i in jid])
    qposmap = np.array([m.jnt_qposadr[i] for i in jid])
    return m, d, dofmap, qposmap


def _S_of_q(dofmap, q):
    R = spatial.zyx_to_rot(q[3:6])
    E = spatial.zyx_rates_to_world_angvel_matrix(q[3:6])
    S = jnp.zeros((24, 24), dtype=q.dtype)
    S = S.at[0:3, 0:3].set(jnp.eye(3, dtype=q.dtype))
    S = S.at[3:6, 3:6].set(R.T @ E)
    S = S.at[(dofmap, np.arange(6, 24))].set(1.0)
    return S


def _set_mj_state(m, d, qposmap, dofmap, q, v=None):
    """Write our (q, v) into MjData; returns (S, Sdot) of the velocity bridge."""
    R = np.array(spatial.zyx_to_rot(jnp.asarray(q[3:6])))
    qx = np.array(spatial.rot_to_quat(jnp.asarray(R)))  # xyzw
    d.qpos[0:3] = q[0:3]
    d.qpos[3:7] = [qx[3], qx[0], qx[1], qx[2]]  # wxyz
    d.qpos[qposmap] = q[6:]
    if v is None:
        v = np.zeros(24)
    S, Sdot = jax.jvp(
        lambda qq: _S_of_q(dofmap, qq), (jnp.asarray(q),), (jnp.asarray(v),)
    )
    S, Sdot = np.array(S), np.array(Sdot)
    d.qvel[:] = S @ v
    return S, Sdot


def _random_qva(rng, scale=0.4):
    return (
        rng.normal(size=24) * scale,
        rng.normal(size=24) * 0.7,
        rng.normal(size=24) * 0.9,
    )


def test_total_mass(mj, model):
    m, _, _, _ = mj
    bid = mujoco.mj_name2id(m, mujoco.mjtObj.mjOBJ_BODY, "base")
    assert abs(m.body_subtreemass[bid] - float(model.total_mass)) < 1e-10


def test_fk_frames(mj, model, rng):
    m, d, dofmap, qposmap = mj
    for _ in range(4):
        q, _, _ = _random_qva(rng)
        _set_mj_state(m, d, qposmap, dofmap, q)
        mujoco.mj_forward(m, d)
        Rf, pf = kinematics.frame_placements(model, jnp.asarray(q))
        for frame in FRAMES:
            bid = mujoco.mj_name2id(m, mujoco.mjtObj.mjOBJ_BODY, frame)
            fid = model.frame_names.index(frame)
            np.testing.assert_allclose(np.array(pf[fid]), d.xpos[bid], atol=1e-12)
            np.testing.assert_allclose(
                np.array(Rf[fid]), d.xmat[bid].reshape(3, 3), atol=1e-12
            )


def test_frame_jacobians(mj, model, rng):
    m, d, dofmap, qposmap = mj
    for _ in range(3):
        q, _, _ = _random_qva(rng)
        S, _ = _set_mj_state(m, d, qposmap, dofmap, q)
        mujoco.mj_forward(m, d)
        J = np.array(kinematics.frame_jacobians(model, jnp.asarray(q)))
        jacp = np.zeros((3, m.nv))
        jacr = np.zeros((3, m.nv))
        for frame in FRAMES:
            bid = mujoco.mj_name2id(m, mujoco.mjtObj.mjOBJ_BODY, frame)
            fid = model.frame_names.index(frame)
            mujoco.mj_jacBody(m, d, jacp, jacr, bid)
            np.testing.assert_allclose(jacp @ S, J[fid, :3], atol=1e-11)
            np.testing.assert_allclose(jacr @ S, J[fid, 3:], atol=1e-11)


def test_frame_jacobian_dot(mj, model, rng):
    """d/dt of the LWA Jacobian: d(J_mj S)/dt = Jdot_mj S + J_mj Sdot."""
    m, d, dofmap, qposmap = mj
    q, v, _ = _random_qva(rng)
    S, Sdot = _set_mj_state(m, d, qposmap, dofmap, q, v)
    mujoco.mj_forward(m, d)
    Jdot = np.array(kinematics.frame_jacobians_dot(model, jnp.asarray(q), jnp.asarray(v)))
    jacp = np.zeros((3, m.nv))
    jacr = np.zeros((3, m.nv))
    jacp_d = np.zeros((3, m.nv))
    jacr_d = np.zeros((3, m.nv))
    for frame in ("LF_FOOT", "z1_end_effector"):
        bid = mujoco.mj_name2id(m, mujoco.mjtObj.mjOBJ_BODY, frame)
        fid = model.frame_names.index(frame)
        mujoco.mj_jacBody(m, d, jacp, jacr, bid)
        # mj_jacDot takes a world-frame point attached to the body; the body
        # origin's current world position gives d/dt of the origin Jacobian.
        mujoco.mj_jacDot(m, d, jacp_d, jacr_d, d.xpos[bid], bid)
        np.testing.assert_allclose(
            jacp_d @ S + jacp @ Sdot, Jdot[fid, :3], atol=1e-9
        )
        np.testing.assert_allclose(
            jacr_d @ S + jacr @ Sdot, Jdot[fid, 3:], atol=1e-9
        )


def test_mass_matrix(mj, model, rng):
    m, d, dofmap, qposmap = mj
    for _ in range(3):
        q, _, _ = _random_qva(rng)
        S, _ = _set_mj_state(m, d, qposmap, dofmap, q)
        mujoco.mj_forward(m, d)
        Mfull = np.zeros((m.nv, m.nv))
        mujoco.mj_fullM(m, d, Mfull)
        M_repo = np.array(dynamics.mass_matrix(model, jnp.asarray(q)))
        # floor set by MuJoCo's principal-axis inertia re-representation
        np.testing.assert_allclose(S.T @ Mfull @ S, M_repo, atol=2e-7)


def test_bias_forces(mj, model, rng):
    """h(q,v) = S^T tau_mj at a = 0 (qacc_mj = Sdot v != 0)."""
    m, d, dofmap, qposmap = mj
    for _ in range(3):
        q, v, _ = _random_qva(rng)
        S, Sdot = _set_mj_state(m, d, qposmap, dofmap, q, v)
        d.qacc[:] = Sdot @ v
        mujoco.mj_inverse(m, d)
        h = np.array(dynamics.nonlinear_effects(model, jnp.asarray(q), jnp.asarray(v)))
        np.testing.assert_allclose(S.T @ d.qfrc_inverse, h, atol=1e-6)


def test_inverse_dynamics(mj, model, rng):
    m, d, dofmap, qposmap = mj
    for _ in range(4):
        q, v, a = _random_qva(rng)
        S, Sdot = _set_mj_state(m, d, qposmap, dofmap, q, v)
        d.qacc[:] = S @ a + Sdot @ v
        mujoco.mj_inverse(m, d)
        tau = np.array(
            dynamics.inverse_dynamics(model, jnp.asarray(q), jnp.asarray(v), jnp.asarray(a))
        )
        np.testing.assert_allclose(S.T @ d.qfrc_inverse, tau, atol=1e-6)


def test_forward_dynamics(mj, model, rng):
    m, d, dofmap, qposmap = mj
    for _ in range(3):
        q, v, _ = _random_qva(rng)
        tau = rng.normal(size=24) * 5.0
        S, Sdot = _set_mj_state(m, d, qposmap, dofmap, q, v)
        d.qfrc_applied[:] = np.linalg.solve(S.T, tau)
        mujoco.mj_forward(m, d)
        a_mj = np.linalg.solve(S, d.qacc - Sdot @ (np.linalg.solve(S, d.qvel)))
        a_repo = np.array(
            dynamics.forward_dynamics(model, jnp.asarray(q), jnp.asarray(v), jnp.asarray(tau))
        )
        # M^-1 amplifies the ~1e-8 representation gap; bound relative to |a|
        np.testing.assert_allclose(a_mj, a_repo, atol=5e-4)
        d.qfrc_applied[:] = 0.0


def test_com_and_centroidal_momentum(mj, model, rng):
    m, d, dofmap, qposmap = mj
    bid = mujoco.mj_name2id(m, mujoco.mjtObj.mjOBJ_BODY, "base")
    for _ in range(4):
        q, v, _ = _random_qva(rng)
        _set_mj_state(m, d, qposmap, dofmap, q, v)
        mujoco.mj_forward(m, d)
        mujoco.mj_subtreeVel(m, d)
        com = np.array(dynamics.com_position(model, jnp.asarray(q)))
        np.testing.assert_allclose(d.subtree_com[bid], com, atol=1e-12)
        h = np.array(dynamics.centroidal_momentum(model, jnp.asarray(q), jnp.asarray(v)))
        np.testing.assert_allclose(
            m.body_subtreemass[bid] * d.subtree_linvel[bid], h[:3], atol=1e-10
        )
        np.testing.assert_allclose(d.subtree_angmom[bid], h[3:], atol=1e-6)
