import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np
from qm_door_tpu.config import default_config
from qm_door_tpu.models import aliengo_z1, centroidal
from qm_door_tpu.wbc.wbc import WbcState, combined_tasks

dt = jnp.float32
model = aliengo_z1(dtype=dt)
cfg = default_config()
x0 = jnp.asarray(cfg.initial_state(), dtype=dt)
rbd = centroidal.rbd_from_generalized(model, centroidal.pinocchio_q(x0), jnp.zeros(24, dtype=dt))
flags = jnp.zeros(4, dtype=dt)
u_des = jnp.zeros(30, dtype=dt)
_, tasks = combined_tasks(model, cfg.wbc, x0, u_des, rbd, flags,
                          WbcState.init(dtype=dt), 0.002, use_arm_init=False)
A = np.asarray(jnp.concatenate([tasks[0].A, tasks[1].A], axis=0), np.float64)
rn = np.linalg.norm(A, axis=1)
print("stacked A:", A.shape)
print("row norms sorted:", np.sort(rn))
row_tol = 1e-6
live = rn > row_tol * max(rn.max(), 1.0)
As = np.where(live[:, None], A / np.maximum(rn, 1e-30)[:, None], 0.0)
G = As @ As.T
w = np.linalg.eigvalsh(G)
print("live rows:", live.sum(), "eig(G) min/max:", w.min(), w.max())
# after dead completion + ridge as in null_projector
diag = np.diagonal(G)
scale = max(diag.max(), 1.0)
dead = (diag < 1e-12 * scale).astype(float)
M = G + np.diag(dead) * scale + 1e-7 * scale * np.eye(G.shape[0])
w2 = np.linalg.eigvalsh(M)
print("eig(M) min:", w2.min())
# f32 cholesky
Mf = jnp.asarray(M, jnp.float32)
L = jnp.linalg.cholesky(Mf)
print("f32 chol finite:", bool(jnp.isfinite(L).all()))
