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
