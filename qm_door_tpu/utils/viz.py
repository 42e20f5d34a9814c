"""Headless trajectory visualization (QmVisualizer / rqt_multiplot role).

The reference publishes RViz markers (feet, force arrows, CoP, support
polygon, optimized trajectories, TF) and rqt_multiplot dashboards
(qm_interface/src/visualization/qm_visualization.cpp,
qm_controllers/config/rqt_multiplot.xml). The TPU-native stack is headless:
this module renders the same channels from a ClosedLoopLog / recorded arrays
into matplotlib figures.
"""
from __future__ import annotations

import numpy as np


def plot_closed_loop(log, path="closed_loop.png", title="qm_door_tpu closed loop"):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    t = np.asarray(log.t)
    base = np.stack(log.base_pose)
    x_obs = np.stack(log.x_obs)
    tau = np.stack(log.tau)

    fig, axes = plt.subplots(2, 2, figsize=(12, 8))
    ax = axes[0, 0]
    ax.plot(t, base[:, 0], label="x")
    ax.plot(t, base[:, 1], label="y")
    ax.plot(t, base[:, 2], label="z")
    ax.set_title("base position [m]")
    ax.legend()

    ax = axes[0, 1]
    ax.plot(t, base[:, 3], label="yaw")
    ax.plot(t, base[:, 4], label="pitch")
    ax.plot(t, base[:, 5], label="roll")
    ax.set_title("base orientation [rad]")
    ax.legend()

    ax = axes[1, 0]
    ax.plot(t, x_obs[:, 0], label="vcom_x")
    ax.plot(t, x_obs[:, 1], label="vcom_y")
    ax.plot(t, x_obs[:, 2], label="vcom_z")
    ax.set_title("normalized momentum (linear)")
    ax.legend()

    ax = axes[1, 1]
    ax.plot(t, np.abs(tau).max(axis=1), label="|tau|_max")
    ax.plot(t, np.abs(tau).mean(axis=1), label="|tau|_mean")
    ax.set_title("joint torques [Nm]")
    ax.legend()

    fig.suptitle(title)
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)
    return path


def plot_support_and_footholds(model, q_traj, flags_traj, path="support.png"):
    """Top-down view: foot positions colored by contact, base path, support
    polygons at sampled instants (QmVisualizer support-polygon/foothold role)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from ..models import kinematics

    import jax
    import jax.numpy as jnp

    q_traj = jnp.asarray(q_traj)
    feet = jax.vmap(lambda q: kinematics.contact_positions(model, q))(q_traj)
    feet = np.asarray(feet)  # (T, 4, 3)
    flags = np.asarray(flags_traj)
    base = np.asarray(q_traj[:, 0:2])

    fig, ax = plt.subplots(figsize=(7, 7))
    ax.plot(base[:, 0], base[:, 1], "k-", lw=1.5, label="base path")
    colors = ["tab:blue", "tab:orange", "tab:green", "tab:red"]
    names = ["LF", "RF", "LH", "RH"]
    for i in range(4):
        stance = flags[:, i] > 0.5
        ax.scatter(feet[stance, i, 0], feet[stance, i, 1], s=6, c=colors[i],
                   label=f"{names[i]} stance")
        ax.scatter(feet[~stance, i, 0], feet[~stance, i, 1], s=3, c=colors[i],
                   alpha=0.2)
    # support polygons at a few instants
    for t in range(0, len(q_traj), max(1, len(q_traj) // 6)):
        pts = feet[t, flags[t] > 0.5][:, :2]
        if len(pts) >= 3:
            hull = pts[np.argsort(np.arctan2(*(pts - pts.mean(0)).T[::-1]))]
            ax.fill(hull[:, 0], hull[:, 1], alpha=0.08, color="gray")
    ax.set_aspect("equal")
    ax.legend(fontsize=8)
    ax.set_title("footholds + support polygons")
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)
    return path


def plot_solution(times, X, U, path="mpc_solution.png"):
    """Plot one MPC solution: optimized base trajectory + contact forces
    (QmVisualizer::publishOptimizedStateTrajectory role)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    times = np.asarray(times)
    X = np.asarray(X)
    U = np.asarray(U)

    fig, axes = plt.subplots(1, 3, figsize=(15, 4))
    axes[0].plot(times, X[:, 6:9])
    axes[0].set_title("base position plan")
    axes[0].legend(["x", "y", "z"])
    axes[1].plot(times, X[:, 0:3])
    axes[1].set_title("vcom plan")
    for foot, name in enumerate(["LF", "RF", "LH", "RH"]):
        axes[2].plot(times[:-1], U[:, 3 * foot + 2], label=name)
    axes[2].set_title("vertical contact forces")
    axes[2].legend()
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)
    return path


def contact_cop(p_feet, forces, eps=1e-6):
    """Center of pressure from foot positions (4,3) and forces (4,3)
    (QmVisualizer CoP marker math: fz-weighted mean of the contact points)."""
    p_feet = np.asarray(p_feet)
    forces = np.asarray(forces)
    fz = np.clip(forces[:, 2], 0.0, None)
    w = fz / max(fz.sum(), eps)
    return (w[:, None] * p_feet).sum(axis=0)


def plot_force_arrows(model, q, u, path="forces.png", ee_wrench=None):
    """Contact-force arrows + CoP at one instant, top-down and side views
    (QmVisualizer::publishOptimizedForceTrajectory / CoP marker role).

    ``u``: MPC input vector — first 12 entries are the foot forces; a
    36-wide force-tracking input's EE wrench can be passed via ``ee_wrench``
    or is read from u[30:36]."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from ..models import kinematics

    q = np.asarray(q)
    u = np.asarray(u)
    F = u[:12].reshape(4, 3)
    p = np.asarray(kinematics.contact_positions(model, q))
    cop = contact_cop(p, F)
    if ee_wrench is None and u.shape[0] >= 36:
        ee_wrench = u[30:36]

    fig, axes = plt.subplots(1, 2, figsize=(11, 5))
    scale = 1.0 / max(np.abs(F).max(), 1.0)

    ax = axes[0]
    ax.quiver(p[:, 0], p[:, 1], F[:, 0] * scale, F[:, 1] * scale,
              color="tab:red", angles="xy", scale_units="xy", scale=1.0,
              width=0.008, label="foot force (xy)")
    order = [0, 1, 3, 2, 0]
    ax.plot(p[order, 0], p[order, 1], "k--", lw=0.8, label="support polygon")
    ax.plot(*cop[:2], "b*", ms=12, label="CoP")
    ax.plot(q[0], q[1], "g^", ms=8, label="base")
    ax.set_title("top-down: tangential forces + CoP")
    ax.set_aspect("equal")
    ax.legend(fontsize=8)

    ax = axes[1]
    ax.quiver(p[:, 0], p[:, 2], F[:, 0] * scale, F[:, 2] * scale,
              color="tab:red", angles="xy", scale_units="xy", scale=1.0,
              width=0.008)
    ax.plot(p[:, 0], p[:, 2], "ko", ms=4)
    if ee_wrench is not None:
        _, p_ee = kinematics.ee_pose(model, q)
        p_ee = np.asarray(p_ee)
        w = np.asarray(ee_wrench)
        ax.quiver(p_ee[0], p_ee[2], w[0] * scale, w[2] * scale,
                  color="tab:purple", angles="xy", scale_units="xy",
                  scale=1.0, width=0.008, label="EE wrench")
        ax.legend(fontsize=8)
    ax.set_title("side view: sagittal forces")
    ax.set_aspect("equal")
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)
    return path


def plot_skeleton(model, q, path="skeleton.png"):
    """Kinematic stick figure from FK (the TF-tree channel of the
    reference's RViz view): every joint body connected to its parent, feet
    and EE highlighted."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from ..models import kinematics

    q = np.asarray(q)
    _, p = kinematics.fk(model, q)
    p = np.asarray(p)

    fig = plt.figure(figsize=(7, 6))
    ax = fig.add_subplot(111, projection="3d")
    for j in range(model.nj):
        par = model.joint_parent[j]
        child = j + 1  # body index of joint j's child
        seg = np.stack([p[par], p[child]])
        ax.plot(seg[:, 0], seg[:, 1], seg[:, 2], "o-", color="tab:gray",
                ms=2, lw=1.2)
    feet = np.asarray(kinematics.contact_positions(model, q))
    ax.scatter(feet[:, 0], feet[:, 1], feet[:, 2], c="tab:red", s=25,
               label="feet")
    _, p_ee = kinematics.ee_pose(model, q)
    p_ee = np.asarray(p_ee)
    ax.scatter(*p_ee, c="tab:purple", s=40, label="EE")
    ax.scatter(*q[0:3], c="tab:green", s=40, label="base")
    ax.legend(fontsize=8)
    ax.set_box_aspect((1, 1, 0.8))
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)
    return path
