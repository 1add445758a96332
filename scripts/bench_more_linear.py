"""Benchmark the fused MonarchLinear kernel against the unfused paths.

Shapes: the Llama-7B fine-tuning workload (x ~ (4, 666, 4096) per 4096-dim
projection -- reference blockdiag_butterfly_multiply.py:89) and the
reference micro-bench shape (1024 x 1024, blk_r 16).

Paths compared (fwd + bwd wrt x, w1, w2; dense frozen):
  fused     more_linear Pallas kernel
  hybrid    XLA dense matmul + Pallas monarch kernel + add
  xla       everything in XLA
"""
import sys, os, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from sparse_matrix_fine_tuning_tpu.kernels.monarch_pallas import monarch_kernel
from sparse_matrix_fine_tuning_tpu.kernels.experimental.more_linear import more_linear
from sparse_matrix_fine_tuning_tpu.ops.monarch import blockdiag_butterfly_multiply

print("backend:", jax.default_backend())


def bench(name, fn, args, iters=100):
    vg = jax.jit(jax.value_and_grad(fn, argnums=(0, 2, 3)))
    jax.block_until_ready(vg(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = vg(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"  {name:8s}: {dt*1e6:9.1f} us/iter")
    return dt


def run(tag, B, n, m, K, r, dtype=jnp.bfloat16):
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    x = jax.random.normal(keys[0], (B, n), dtype=dtype)
    wd = jax.random.normal(keys[1], (m, n), dtype=dtype) * 0.02
    w1 = jax.random.normal(keys[2], (K, r, n // K), dtype=dtype) * 0.02
    w2 = jax.random.normal(keys[3], (K, m // K, r), dtype=dtype) * 0.02

    def loss_fused(x, wd, w1, w2):
        return jnp.sum(more_linear(x, wd, w1, w2).astype(jnp.float32) ** 2)

    def loss_hybrid(x, wd, w1, w2):
        y = jax.lax.dot_general(x, wd, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32).astype(dtype)
        y = y + monarch_kernel(x, w1, w2)
        return jnp.sum(y.astype(jnp.float32) ** 2)

    def loss_xla(x, wd, w1, w2):
        y = jax.lax.dot_general(x, wd, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32).astype(dtype)
        y = y + blockdiag_butterfly_multiply(x, w1, w2)
        return jnp.sum(y.astype(jnp.float32) ** 2)

    # correctness cross-check first
    a = jax.jit(loss_fused)(x, wd, w1, w2)
    c = jax.jit(loss_xla)(x, wd, w1, w2)
    rel = abs(float(a) - float(c)) / max(abs(float(c)), 1e-9)
    print(f"{tag}: loss rel diff fused-vs-xla = {rel:.2e}")

    t_f = bench("fused", loss_fused, (x, wd, w1, w2))
    t_h = bench("hybrid", loss_hybrid, (x, wd, w1, w2))
    t_x = bench("xla", loss_xla, (x, wd, w1, w2))
    print(f"  speedup fused vs xla: {t_x / t_f:.3f}x ; vs hybrid: {t_h / t_f:.3f}x")
    return t_f, t_h, t_x


if __name__ == "__main__":
    run("llama-7B qkv-shape (2664 x 4096 -> 4096, nblocks4 blk_r4)",
        2664, 4096, 4096, 4, 4)
    run("reference micro-bench (1024 x 1024, nblocks4 blk_r16)",
        1024, 1024, 1024, 4, 16)
    run("llama-7B gate-shape (2664 x 4096 -> 11264pad, nblocks4 blk_r8)",
        2664, 4096, 11264, 4, 8)
