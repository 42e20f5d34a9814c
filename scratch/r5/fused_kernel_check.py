"""TPU compile+correctness+timing of the fused Riccati kernel (production shapes)."""
import time
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_default_matmul_precision", "highest")
import sys
sys.path.insert(0, "/root/repo")
from qm_door_tpu.ops.pallas_riccati import riccati_backward_fused_lq
from qm_door_tpu.solver.riccati import riccati_backward_batched
from qm_door_tpu.solver.transcription import ProjectedLq

B, N, nx, nu = 256, 67, 30, 26
rng = np.random.default_rng(0)

def spd(*s):
    M = rng.normal(size=s + (s[-1],)) * 0.3
    return jnp.asarray((M @ np.swapaxes(M, -1, -2) + 2.0 * np.eye(s[-1])).astype(np.float32))

f32 = lambda x: jnp.asarray(x.astype(np.float32))
lq = ProjectedLq(
    A=f32(rng.normal(size=(B, N, nx, nx)) * 0.2 + np.eye(nx)),
    B=f32(rng.normal(size=(B, N, nx, nu)) * 0.3),
    d=f32(rng.normal(size=(B, N, nx)) * 0.1),
    lx=f32(rng.normal(size=(B, N, nx))),
    lu=f32(rng.normal(size=(B, N, nu))),
    lxx=spd(B, N, nx), luu=spd(B, N, nu),
    lux=f32(rng.normal(size=(B, N, nu, nx)) * 0.2),
    lxx_f=spd(B, nx), lx_f=f32(rng.normal(size=(B, nx))),
    p=jnp.zeros((B, N, nu), jnp.float32), Pu=None, Px=None,
)

fused = jax.jit(lambda l: riccati_backward_fused_lq(l))
scan = jax.jit(lambda l: riccati_backward_batched(l, backend="pallas"))
scan_x = jax.jit(lambda l: riccati_backward_batched(l, backend="xla"))

for name, fn in (("fused", fused), ("scan_pallas", scan), ("scan_xla", scan_x)):
    t0 = time.time()
    K, kff = fn(lq); jax.block_until_ready(K)
    c = time.time() - t0
    t0 = time.time()
    reps = 20
    for _ in range(reps):
        K, kff = fn(lq)
    jax.block_until_ready(K)
    dt = (time.time() - t0) / reps
    nan = int(jnp.isnan(K).sum())
    print(f"{name}: compile {c:.1f}s, {1e6*dt/B:.2f} us/solve, {dt*1e3:.2f} ms/call, nanK={nan}")
    if name == "fused":
        Kf, kf = K, kff
    elif name == "scan_xla":
        err = float(jnp.max(jnp.abs(Kf - K)))
        errk = float(jnp.max(jnp.abs(kf - kff)))
        print(f"fused vs scan_xla: max|dK|={err:.3e} max|dk|={errk:.3e} (scale {float(jnp.max(jnp.abs(K))):.2f})")
