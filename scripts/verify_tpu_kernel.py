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

# ---- fused int4 dequant-matmul (kernels/quant_matmul.py): Mosaic legality
# (interpret mode accepts relayouts Mosaic rejects -- this section is the
# real-chip gate), parity vs the dequantize-then-dot oracle, and slope
# timing vs the XLA int4 path and the bf16 dense dot at a decode shape.
import numpy as np

from sparse_matrix_fine_tuning_tpu.kernels.quant_matmul import (
    int4_matmul, int4_matmul_supported)
from sparse_matrix_fine_tuning_tpu.quant import dequantize_int4, quantize_int4
from sparse_matrix_fine_tuning_tpu.utils.benchlib import time_fn

OUT, IN, G, DB = 5632, 2048, 64, 4
rng = np.random.default_rng(0)
wq = rng.normal(size=(OUT, IN)).astype(np.float32) * 0.02
packed_t, scales = quantize_int4(wq, G)
packed_t, scales = jnp.asarray(packed_t), jnp.asarray(scales)
xq = jnp.asarray(rng.normal(size=(DB, IN)), jnp.bfloat16)
print("int4 kernel supported:", int4_matmul_supported(xq.shape, packed_t.shape, G))
wd16 = dequantize_int4(packed_t, scales, G, jnp.bfloat16)
y_ref = jax.jit(lambda x, w: x @ w.T)(xq, wd16)
y_ker = jax.jit(lambda x: int4_matmul(x, packed_t, scales, G))(xq)
print(f"int4 fwd max|kernel-oracle| = "
      f"{float(jnp.abs(f32(y_ker) - f32(y_ref)).max()):.5f} "
      f"(out scale {float(jnp.abs(f32(y_ref)).max()):.3f})")
dx_k = jax.jit(jax.grad(lambda x: jnp.sum(f32(
    int4_matmul(x, packed_t, scales, G)) ** 2)))(xq)
dx_r = jax.jit(jax.grad(lambda x: jnp.sum(f32(x @ wd16.T) ** 2)))(xq)
print(f"int4 dx  max|kernel-oracle| = "
      f"{float(jnp.abs(f32(dx_k) - f32(dx_r)).max()):.4f} "
      f"(scale {float(jnp.abs(f32(dx_r)).max()):.3f})")

import statistics


def xla_int4(x, p, s):
    lo = (p & 0xF).astype(jnp.int8) - 8
    hi = ((p >> 4) & 0xF).astype(jnp.int8) - 8
    h, ns2 = IN // 2, scales.shape[0] // 2

    def half(xh, qt, st):
        sb = jnp.broadcast_to(st[:, None, :], (ns2, G, OUT)).reshape(h, OUT)
        wd = (qt.astype(jnp.float32) * sb).astype(jnp.bfloat16)
        return jax.lax.dot_general(xh, wd, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
    return (half(x[:, :h], lo, s[:ns2]) + half(x[:, h:], hi, s[ns2:])
            ).astype(x.dtype)


from sparse_matrix_fine_tuning_tpu.kernels.quant_matmul import (
    int8_matmul, int8_matmul_supported)
from sparse_matrix_fine_tuning_tpu.quant import dequantize_int8, quantize_int8

q8_t, s8 = map(jnp.asarray, quantize_int8(wq))
w8d = dequantize_int8(q8_t, s8, jnp.bfloat16)
print("int8 kernel supported:", int8_matmul_supported(xq.shape, q8_t.shape))
y8k = jax.jit(lambda x: int8_matmul(x, q8_t, s8))(xq)
y8r = jax.jit(lambda x, w: x @ w.T)(xq, w8d)
print(f"int8 fwd max|kernel-oracle| = "
      f"{float(jnp.abs(f32(y8k) - f32(y8r)).max()):.5f} "
      f"(out scale {float(jnp.abs(f32(y8r)).max()):.3f})")

for name, fn, args in (
    ("bf16 dense ", lambda x, w: (x @ w.T), (xq, wd16)),
    ("int4 xla   ", xla_int4, (xq, packed_t, scales)),
    ("int4 pallas", lambda x, p, s: int4_matmul(x, p, s, G),
     (xq, packed_t, scales)),
    ("int8 pallas", lambda x, q, s: int8_matmul(x, q, s), (xq, q8_t, s8)),
):
    # 10-40 us ops behind a ~24 ms (+-1 ms jitter) dispatch: the slope
    # needs >= 512 in-loop iterations for sub-us precision
    t = statistics.median(time_fn(fn, args, iters=512, chain_argnum=0)
                          for _ in range(3))
    print(f"{name} decode dot ({OUT}x{IN} b{DB}): {t*1e6:7.1f} us")


# ---- composition: quantized frozen base -> fused monarch_add.  The layer's
# TPU hot path chains two custom VJPs (int4_matmul's dense output feeds
# monarch_add); neither the CPU suite (gates require backend=='tpu') nor
# the per-kernel sections above exercise them together.
from flax import nnx
from sparse_matrix_fine_tuning_tpu.layers import MonarchLinear
from sparse_matrix_fine_tuning_tpu.quant import quantize_frozen_base
from sparse_matrix_fine_tuning_tpu.kernels.monarch_pallas import monarch_add
from sparse_matrix_fine_tuning_tpu.ops import blockdiag_butterfly_multiply as bbm

INq = OUTq = 2048
Bq = 2048  # b*(in+out) = 1<<23: clears the auto fuse-gate's 1<<22 floor
wq_dense = jax.random.normal(jax.random.PRNGKey(7), (OUTq, INq)) * 0.05
lay = MonarchLinear(INq, OUTq, weights=wq_dense, dtype=jnp.bfloat16,
                    rngs=nnx.Rngs(0))
lay.blkdiag2.set_value(jax.random.normal(
    jax.random.PRNGKey(9), lay.blkdiag2[...].shape) * 0.1)
quantize_frozen_base(lay, bits=4, group_size=64)
xl = jax.random.normal(jax.random.PRNGKey(10), (Bq, INq), jnp.bfloat16)
assert lay._can_fuse_add(xl), "fuse gate must co-activate for this check"
assert int4_matmul_supported(xl.shape, lay.dense[...].shape,
                             lay.quant_group, xl.dtype.itemsize), \
    "int4 kernel gate must co-activate for this check"

gd_l, st_l = nnx.split(lay)
y_lay = jax.jit(lambda st, x: nnx.merge(gd_l, st)(x))(st_l, xl)
wdq = dequantize_int4(lay.dense[...], lay.dense_scales[...],
                      lay.quant_group, jnp.bfloat16)
w1q = lay.blkdiag1[...].astype(jnp.bfloat16)
w2q = lay.blkdiag2[...].astype(jnp.bfloat16)
y_comp_ref = jax.jit(lambda x: (x @ wdq.T) + bbm(x, w1q, w2q))(xl)
print(f"int4+fused-add layer fwd max|layer-oracle| = "
      f"{float(jnp.abs(f32(y_lay) - f32(y_comp_ref)).max()):.5f} "
      f"(out scale {float(jnp.abs(f32(y_comp_ref)).max()):.3f})")

pk_l, sc_l, g_l = lay.dense[...], lay.dense_scales[...], lay.quant_group

def comp_loss(x, w1, w2):
    base = int4_matmul(x, pk_l, sc_l, g_l)
    return jnp.sum(f32(monarch_add(base, x, w1, w2)) ** 2)

def comp_oracle(x, w1, w2):
    base = jax.lax.dot_general(
        x, wdq, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(x.dtype)
    return jnp.sum(f32(base + bbm(x, w1, w2)) ** 2)

gc = jax.jit(jax.grad(comp_loss, argnums=(0, 1, 2)))(xl, w1q, w2q)
go = jax.jit(jax.grad(comp_oracle, argnums=(0, 1, 2)))(xl, w1q, w2q)
for nm, a, b in zip(("comp dx", "comp dw1", "comp dw2"), gc, go):
    print(f"{nm}: max diff {float(jnp.abs(f32(a)-f32(b)).max()):.4f} "
          f"vs scale {float(jnp.abs(f32(b)).max()):.4f}")
