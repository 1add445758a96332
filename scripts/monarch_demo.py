"""MonarchLinear walkthrough (reference demos/monarch_demo.ipynb as a script).

Shows: adapter construction from a dense layer, parameter saving ratio,
dense->Monarch SVD projection quality vs rank, merge/unmerge, and a few
training steps on a toy regression.
"""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import nnx

from sparse_matrix_fine_tuning_tpu.layers import MonarchLinear
from sparse_matrix_fine_tuning_tpu.ops.monarch import blockdiag_butterfly_multiply
from sparse_matrix_fine_tuning_tpu.ops.projection import (
    blockdiag_butterfly_project_einsum_rank)
from sparse_matrix_fine_tuning_tpu.peft import trainable_filter

print("== 1. Adapter over a frozen dense layer ==")
d = 256
W = jax.random.normal(jax.random.PRNGKey(0), (d, d)) / np.sqrt(d)
layer = MonarchLinear(d, d, weights=W, peft_config={"nblocks": 4, "blk_r": 4},
                      rngs=nnx.Rngs(0))
print(f"dense params: {d*d}, adapter params: "
      f"{layer.blkdiag1[...].size + layer.blkdiag2[...].size} "
      f"(saving ratio {layer.saving:.4f})")
x = jax.random.normal(jax.random.PRNGKey(1), (8, d))
print("adapter-at-init == dense:",
      bool(jnp.allclose(layer(x), x @ W.T, atol=1e-5)))

print("\n== 2. SVD projection quality vs rank ==")
for rank in (1, 4, 16, 64):
    w1, w2 = blockdiag_butterfly_project_einsum_rank(W, 4, 4, rank)
    approx = blockdiag_butterfly_multiply(jnp.eye(d), w1, w2).T
    err = float(jnp.linalg.norm(approx - W) / jnp.linalg.norm(W))
    n_params = w1.size + w2.size
    print(f"  rank {rank:3d}: rel fro error {err:.4f}  params {n_params}"
          f" ({n_params/(d*d):.3f}x dense)")

print("\n== 3. Train the adapter on a toy target, then merge ==")
target = W + 0.05 * jax.random.normal(jax.random.PRNGKey(2), (d, d)) / np.sqrt(d)
filt = trainable_filter()
opt = nnx.Optimizer(layer, optax.adam(1e-2), wrt=filt)

@nnx.jit
def step(layer, opt, x, y):
    def loss(l):
        return jnp.mean((l(x) - y) ** 2)
    val, grads = nnx.value_and_grad(loss, argnums=nnx.DiffState(0, filt))(layer)
    opt.update(layer, grads)
    return val

for i in range(200):
    xb = jax.random.normal(jax.random.PRNGKey(100 + i), (64, d))
    v = step(layer, opt, xb, xb @ target.T)
print(f"final train mse: {float(v):.6f}")

before = layer(x)
layer.merge_adapter()
print("merged; forward unchanged:",
      bool(jnp.allclose(layer(x), before, atol=1e-4)))
layer.unmerge_adapter()
print("unmerged; forward unchanged:",
      bool(jnp.allclose(layer(x), before, atol=1e-4)))
