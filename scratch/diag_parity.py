import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np
from qm_door_tpu.config import default_config
from qm_door_tpu.models import aliengo_z1, centroidal
from qm_door_tpu.wbc.wbc import WbcState, hierarchical_wbc, hierarchical_wbc_batched

rng = np.random.default_rng(0)
for dtype in (jnp.float32,):
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
        for i in range(B)])
    flagss = jnp.tile(flags[None], (B, 1))
    def one(x, u, r, f):
        cmd, _ = hierarchical_wbc(model, cfg.wbc, x, u, r, f,
                                  WbcState.init(dtype=dtype), 0.002, use_arm_init=False)
        return cmd
    cmd_ref = jax.vmap(one)(xs, us, rbds, flagss)
    state = WbcState(input_last=jnp.zeros((B, 30), dtype=dtype))
    cmd_b, _ = hierarchical_wbc_batched(model, cfg.wbc, xs, us, rbds, flagss,
                                        state, 0.002, use_arm_init=False, backend="xla")
    scale = np.maximum(np.abs(np.asarray(cmd_ref)), 1.0)
    dev = np.abs(np.asarray(cmd_b) / scale - np.asarray(cmd_ref) / scale)
    print(dtype, "max relative deviation:", dev.max())

# where does the deviation live? [qdd(24); F(12); tau(18)]
idx = np.unravel_index(dev.argmax(), dev.shape)
print("argmax:", idx, "cmd_ref:", np.asarray(cmd_ref)[idx], "cmd_b:", np.asarray(cmd_b)[idx])
for name, sl in [("qdd", slice(0, 24)), ("F", slice(24, 36)), ("tau", slice(36, 54))]:
    print(name, "max dev:", dev[:, sl].max())

# calibrate: each f32 path vs the f64 truth
dtype = jnp.float64
model64 = aliengo_z1(dtype=dtype)
xs64, us64, rbds64, flagss64 = (a.astype(dtype) for a in (xs, us, rbds, flagss))
def one64(x, u, r, f):
    cmd, _ = hierarchical_wbc(model64, cfg.wbc, x, u, r, f,
                              WbcState.init(dtype=dtype), 0.002, use_arm_init=False)
    return cmd
cmd64 = jax.vmap(one64)(xs64, us64, rbds64, flagss64)
scale64 = np.maximum(np.abs(np.asarray(cmd64)), 1.0)
for name, c in [("vmap f32", cmd_ref), ("batch f32", cmd_b)]:
    d64 = np.abs(np.asarray(c) / scale64 - np.asarray(cmd64) / scale64)
    print(name, "vs f64 truth: max rel dev:", d64.max())

d64 = np.abs(np.asarray(cmd_ref) / scale64 - np.asarray(cmd64) / scale64)
idx = np.unravel_index(d64.argmax(), d64.shape)
print("argmax vs f64:", idx, "f32:", np.asarray(cmd_ref)[idx], "f64:", np.asarray(cmd64)[idx])
for name, sl in [("qdd", slice(0, 24)), ("F", slice(24, 36)), ("tau", slice(36, 54))]:
    print(name, "f32-vs-f64 max dev:", d64[:, sl].max())
# top deviating indices
order = np.argsort(d64.max(axis=0))[::-1][:8]
for j in order:
    print(f"  idx {j}: dev {d64[:, j].max():.4f}  f32 {np.asarray(cmd_ref)[:, j]}  f64 {np.asarray(cmd64)[:, j]}")
