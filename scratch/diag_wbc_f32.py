"""Diagnose the f32 batched-WBC EoM residual (ADVICE round-2 high finding).

Hypotheses:
  H1 normal-equations conditioning: null_projector forms G = A A^T without
     row equilibration; level-0 stacks EoM rows (||row|| ~ 20..200) with
     no-motion rows (~1) -> cond(G) ~ 1e6+, f32 Cholesky error ~ 1e-1.
  H2 h_reg bias (1e-5 ridge on H_zz).
  H3 PDIP freeze tolerance (mu_tol 1e-5).
"""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=1"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from qm_door_tpu.config import default_config
from qm_door_tpu.models import aliengo_z1, centroidal
from qm_door_tpu.wbc import tasks as T
from qm_door_tpu.wbc.wbc import WbcState, hierarchical_wbc
from qm_door_tpu.wbc.hoqp import null_projector

rng = np.random.default_rng(0)
dtype = jnp.float32
model = aliengo_z1(dtype=dtype)
cfg = default_config()
B = 4
x0 = jnp.asarray(cfg.initial_state(), dtype=dtype)
xs = jnp.asarray(np.asarray(x0)[None] + rng.normal(size=(B, 30)) * 0.01, dtype=dtype)
flags = jnp.asarray([1.0, 0.0, 0.0, 1.0], dtype=dtype)
u_des = centroidal.weight_compensating_input(model, flags)
us = jnp.tile(u_des[None], (B, 1))
rbds = jnp.stack([
    centroidal.rbd_from_generalized(
        model, centroidal.pinocchio_q(xs[i]), jnp.zeros(24, dtype=dtype))
    for i in range(B)
])

i = 0
data = T.build_wbc_data(model, xs[i], us[i], rbds[i], flags,
                        jnp.zeros(30, dtype=dtype), 0.002)
task0 = T.concat_tasks(
    T.floating_base_eom_task(data),
    T.torque_limits_task(data),
    T.no_contact_motion_task(data),
    T.friction_cone_task(data, jnp.asarray(0.3, dtype=dtype)),
)
A0 = np.asarray(task0.A, np.float64)
rn = np.linalg.norm(A0, axis=1)
print("level-0 eq rows:", A0.shape, "row norms min/max (nonzero):",
      rn[rn > 0].min(), rn[rn > 0].max())
G = A0 @ A0.T
live = rn > 0
print("cond(G) on live rows:", np.linalg.cond(G[np.ix_(live, live)]))
As = A0 / np.maximum(rn, 1.0)[:, None]
Gs = As @ As.T
print("cond(G) after row equilibration:", np.linalg.cond(Gs[np.ix_(live, live)]))

# projector quality at f32, before/after row equilibration
Af = jnp.asarray(A0, jnp.float32)
P = null_projector(Af)
Pe = null_projector(jnp.asarray(As, jnp.float32))
# projector error: ||A P|| should be ~0
print("||A @ P||_max  raw   :", float(jnp.abs(Af @ P).max()))
print("||A @ P||_max  equil :", float(jnp.abs(Af @ Pe).max()))

# full tick residual, current code
def eom_res(cmd):
    eom = T.floating_base_eom_task(data)
    return float(jnp.abs(eom.A @ cmd[:36] - eom.b).max())

cmd, _ = hierarchical_wbc(model, cfg.wbc, xs[i], us[i], rbds[i], flags,
                          WbcState.init(dtype=dtype), 0.002, use_arm_init=False)
print("current f32 tick EoM residual:", eom_res(cmd))

# --- decomposition: residual after each cascade level --------------------
from qm_door_tpu.wbc.wbc import combined_tasks
from qm_door_tpu.wbc.hoqp import solve_hierarchy

_, tasks3 = combined_tasks(model, cfg.wbc, xs[i], us[i], rbds[i], flags,
                           WbcState.init(dtype=dtype), 0.002, use_arm_init=False)
for k in (1, 2, 3):
    xk = solve_hierarchy(tasks3[:k])
    eom = T.floating_base_eom_task(data)
    print(f"after level {k-1}: EoM residual =",
          float(jnp.abs(eom.A @ xk - eom.b).max()))

# same decomposition at f64 for comparison
model64 = aliengo_z1(dtype=jnp.float64)
x64 = xs[i].astype(jnp.float64); u64 = us[i].astype(jnp.float64)
rbd64 = rbds[i].astype(jnp.float64); fl64 = flags.astype(jnp.float64)
data64 = T.build_wbc_data(model64, x64, u64, rbd64, fl64,
                          jnp.zeros(30, dtype=jnp.float64), 0.002)
_, t3_64 = combined_tasks(model64, cfg.wbc, x64, u64, rbd64, fl64,
                          WbcState.init(dtype=jnp.float64), 0.002, use_arm_init=False)
for k in (1, 2, 3):
    xk = solve_hierarchy(t3_64[:k])
    eom = T.floating_base_eom_task(data64)
    print(f"f64 after level {k-1}: EoM residual =",
          float(jnp.abs(eom.A @ xk - eom.b).max()))
