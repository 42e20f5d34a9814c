"""Serial-dependent timing: each call's input depends on the previous output."""
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
    lx=f32(rng.normal(size=(B, N, nx))), lu=f32(rng.normal(size=(B, N, nu))),
    lxx=spd(B, N, nx), luu=spd(B, N, nu),
    lux=f32(rng.normal(size=(B, N, nu, nx)) * 0.2),
    lxx_f=spd(B, nx), lx_f=f32(rng.normal(size=(B, nx))),
    p=jnp.zeros((B, N, nu), jnp.float32), Pu=None, Px=None,
)

def chain(fn, l, reps):
    def body(i, ll):
        K, kff = fn(ll)
        # feed a kff-derived perturbation back into d: serial dependence
        return ll.replace(d=ll.d + 1e-6 * jnp.swapaxes(K[..., 0:1, :], -1, -2)[..., 0] if False else ll.d + 1e-6 * kff[..., :nx] if nu >= nx else ll.d)
    return body

fused = lambda l: riccati_backward_fused_lq(l)
scanp = lambda l: riccati_backward_batched(l, backend="pallas")

for name, fn in (("fused", fused), ("scan_pallas", scanp)):
    @jax.jit
    def run_chain(l):
        def body(i, dcur):
            K, kff = fn(l.replace(d=dcur))
            return dcur + 1e-6 * K[:, :, 0, :]   # (B,N,nx) dependence on K
        return jax.lax.fori_loop(0, 20, body, l.d)
    out = run_chain(lq); jax.block_until_ready(out)  # compile
    t0 = time.time()
    out = run_chain(lq); jax.block_until_ready(out)
    dt = (time.time() - t0) / 20
    print(f"{name}: {1e6*dt/B:.2f} us/solve serial-chained ({dt*1e3:.2f} ms/call)")
