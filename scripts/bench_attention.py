"""Attention implementation parity + speed on TPU.

Compares the three LlamaAttention paths (einsum / dpa / splash) at a
Llama-7B-shaped single layer: b=4, t=1024, 32 heads, head_dim 128
(the reference's flash-attention-2 slot, loreft/train.py:122).
"""
import sys, os, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from sparse_matrix_fine_tuning_tpu.models.llama import _splash_attention

print("backend:", jax.default_backend())

B, T, H, D = 4, 1024, 32, 128
ks = jax.random.split(jax.random.PRNGKey(0), 3)
q = jax.random.normal(ks[0], (B, T, H, D), jnp.bfloat16)
k = jax.random.normal(ks[1], (B, T, H, D), jnp.bfloat16)
v = jax.random.normal(ks[2], (B, T, H, D), jnp.bfloat16)
scale = 1.0 / (D ** 0.5)


def einsum_attn(q, k, v):
    causal = jnp.tril(jnp.ones((T, T), bool))
    bias = jnp.where(causal[None, None], 0.0, -1e9).astype(q.dtype)
    scores = jnp.einsum("bthd,bshd->bhts", q, k) * scale + bias
    probs = jax.nn.softmax(scores.astype(jnp.float32), -1).astype(q.dtype)
    return jnp.einsum("bhts,bshd->bthd", probs, v)


def dpa_attn(q, k, v):
    return jax.nn.dot_product_attention(q, k, v, scale=scale, is_causal=True)


def splash_attn(q, k, v):
    return _splash_attention(q, k, v)


def loss(fn):
    def f(q, k, v):
        return jnp.sum(fn(q, k, v).astype(jnp.float32) ** 2)
    return f


ref = einsum_attn(q, k, v)
for name, fn in (("dpa", dpa_attn), ("splash", splash_attn)):
    try:
        out = jax.jit(fn)(q, k, v)
        d = float(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32)).max())
        print(f"{name}: max diff vs einsum = {d:.4f}")
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e).splitlines()[0][:120]}")

for name, fn in (("einsum", einsum_attn), ("dpa", dpa_attn), ("splash", splash_attn)):
    try:
        vg = jax.jit(jax.value_and_grad(loss(fn), argnums=(0, 1, 2)))
        jax.block_until_ready(vg(q, k, v))
        t0 = time.perf_counter()
        for _ in range(50):
            out = vg(q, k, v)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / 50
        flops = 4 * B * H * T * T * D * 2 * 1.5  # fwd + ~2x bwd, causal ~0.5
        print(f"{name}: {dt*1e6:8.1f} us/iter fwd+bwd  (~{flops/dt/1e12:.1f} TFLOP/s)")
    except Exception as e:
        print(f"{name}: bench FAILED {type(e).__name__}")
