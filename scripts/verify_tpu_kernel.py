"""Drive the public ops/kernels API on the real TPU chip.

Usage: python scripts/verify_tpu_kernel.py
Checks fused-Pallas vs XLA parity (fwd + grads), SVD projection round-trip,
and times fwd+bwd at the reference kernel-bench config
(seq 1024 x dim 1024, nblocks 4, blk_r 16 -- demos/test_triton.py:20-24).
"""
import sys, os, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from sparse_matrix_fine_tuning_tpu.ops import (
    blockdiag_butterfly_multiply, blockdiag_butterfly_project_einsum_rank,
)
from sparse_matrix_fine_tuning_tpu.kernels import monarch_kernel, monarch_kernel_supported

print("backend:", jax.default_backend(), jax.devices())

B, n, K, r = 1024, 1024, 4, 16
P = n // K
kx, k1, k2 = jax.random.split(jax.random.PRNGKey(0), 3)
x = jax.random.normal(kx, (B, n), dtype=jnp.bfloat16)
w1 = jax.random.normal(k1, (K, r, P), dtype=jnp.bfloat16) * 0.02
w2 = jax.random.normal(k2, (K, P, r), dtype=jnp.bfloat16) * 0.02
print("kernel supported:", monarch_kernel_supported(n, w1.shape, w2.shape))

out_p = jax.jit(lambda x, a, b: monarch_kernel(x, a, b))(x, w1, w2)
out_x = jax.jit(blockdiag_butterfly_multiply)(x, w1, w2)
f32 = lambda t: t.astype(jnp.float32)
print(f"fwd max|pallas-xla| = {float(jnp.abs(f32(out_p)-f32(out_x)).max()):.5f} "
      f"(out scale {float(jnp.abs(f32(out_x)).max()):.3f})")

def loss_p(x, w1, w2): return jnp.sum(f32(monarch_kernel(x, w1, w2)) ** 2)
def loss_x(x, w1, w2): return jnp.sum(f32(blockdiag_butterfly_multiply(x, w1, w2)) ** 2)
gp = jax.jit(jax.grad(loss_p, argnums=(0, 1, 2)))(x, w1, w2)
gx = jax.jit(jax.grad(loss_x, argnums=(0, 1, 2)))(x, w1, w2)
for nm, a, b in zip(("dx", "dw1", "dw2"), gp, gx):
    print(f"{nm}: max diff {float(jnp.abs(f32(a)-f32(b)).max()):.4f} "
          f"vs scale {float(jnp.abs(f32(b)).max()):.3f}")

M = jax.random.normal(jax.random.PRNGKey(5), (256, 256))
pw1, pw2 = blockdiag_butterfly_project_einsum_rank(M, 4, 4, 64)
xs = jax.random.normal(jax.random.PRNGKey(6), (8, 256))
err = float(jnp.abs(blockdiag_butterfly_multiply(xs, pw1, pw2) - xs @ M.T).max())
print(f"projection full-rank reconstruction max err = {err:.2e}")

vg_p = jax.jit(jax.value_and_grad(loss_p, argnums=(0, 1, 2)))
vg_x = jax.jit(jax.value_and_grad(loss_x, argnums=(0, 1, 2)))
for name, fn in (("pallas", vg_p), ("xla", vg_x)):
    jax.block_until_ready(fn(x, w1, w2))
    t0 = time.perf_counter()
    for _ in range(100):
        v, g = fn(x, w1, w2)
    jax.block_until_ready(g)
    print(f"{name} fwd+bwd: {(time.perf_counter()-t0)/100*1e6:.1f} us/iter")
