import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np
from qm_door_tpu.config import default_config
from qm_door_tpu.models import aliengo_z1, centroidal
from qm_door_tpu.wbc.wbc import WbcState, hierarchical_wbc, combined_tasks
from qm_door_tpu.wbc.hoqp import solve_hierarchy, null_projector, Task
from qm_door_tpu.wbc import tasks as T
from qm_door_tpu.wbc.qp import solve_qp

dt = jnp.float32
model = aliengo_z1(dtype=dt)
cfg = default_config()
x0 = jnp.asarray(cfg.initial_state(), dtype=dt)
rbd = centroidal.rbd_from_generalized(model, centroidal.pinocchio_q(x0), jnp.zeros(24, dtype=dt))
flags = jnp.zeros(4, dtype=dt)
u_des = jnp.zeros(30, dtype=dt)
_, tasks = combined_tasks(model, cfg.wbc, x0, u_des, rbd, flags,
                          WbcState.init(dtype=dt), 0.002, use_arm_init=False)
x = jnp.zeros(36, dtype=dt)
Z = jnp.eye(36, dtype=dt)
prev = []
for lvl, task in enumerate(tasks):
    A, b, D, f = task
    nv = D.shape[0]
    AZ = A @ Z
    h_reg = 1e-5
    dead_reg = jnp.eye(36, dtype=dt) - Z if lvl > 0 else jnp.zeros((36, 36), dtype=dt)
    H_zz = AZ.T @ AZ + dead_reg + h_reg * jnp.eye(36, dtype=dt)
    c_z = AZ.T @ (A @ x - b)
    n = 36
    H = jnp.zeros((n + nv, n + nv), dtype=dt).at[:n, :n].set(H_zz).at[n:, n:].set(jnp.eye(nv, dtype=dt))
    c = jnp.concatenate([c_z, jnp.zeros(nv, dtype=dt)])
    G_rows = [jnp.concatenate([D @ Z, -jnp.eye(nv, dtype=dt)], axis=1),
              jnp.concatenate([jnp.zeros((nv, n), dtype=dt), -jnp.eye(nv, dtype=dt)], axis=1)]
    h_rows = [f - D @ x, jnp.zeros(nv, dtype=dt)]
    for Dp, fp in prev:
        G_rows.append(jnp.concatenate([Dp @ Z, jnp.zeros((Dp.shape[0], nv), dtype=dt)], axis=1))
        h_rows.append(fp - Dp @ x)
    G = jnp.concatenate(G_rows, axis=0); h = jnp.concatenate(h_rows)
    sol, lam, s = solve_qp(H, c, G, h, iters=40)
    print(f"level {lvl}: finite sol {bool(jnp.isfinite(sol).all())}, "
          f"finite lam {bool(jnp.isfinite(lam).all())}, finite s {bool(jnp.isfinite(s).all())}, "
          f"|z| {float(jnp.abs(sol[:n]).max()):.3e}")
    z, v = sol[:n], sol[n:]
    x = x + Z @ z
    prev.append((D, f + v))
    if lvl < 2:
        Z = null_projector(jnp.concatenate([t.A for t in tasks[:lvl+1]], axis=0))
        print("   Z finite:", bool(jnp.isfinite(Z).all()))
