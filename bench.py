"""Benchmark entry point (run by the driver on real TPU hardware).

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Headline metric: fused Pallas Monarch kernel fwd+bwd speedup over the
unfused XLA path at the reference kernel-benchmark configuration
(seq 1024 x dim 1024, nblocks 4, blk_r 16, half precision -- reference
demos/test_triton.py:20-24).  The reference's Triton kernel reports ~1.2x
over its optimized PyTorch path (reference README.md:11), so
vs_baseline = speedup / 1.2.
"""

import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def _time(fn, *args, iters=200, warmup=2):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    from sparse_matrix_fine_tuning_tpu.kernels.monarch_pallas import monarch_kernel
    from sparse_matrix_fine_tuning_tpu.ops.monarch import blockdiag_butterfly_multiply

    B, n, K, r = 1024, 1024, 4, 16
    P = n // K
    kx, k1, k2 = jax.random.split(jax.random.PRNGKey(0), 3)
    dtype = jnp.bfloat16
    x = jax.random.normal(kx, (B, n), dtype=dtype)
    w1 = jax.random.normal(k1, (K, r, P), dtype=dtype) * 0.02
    w2 = jax.random.normal(k2, (K, P, r), dtype=dtype) * 0.02

    def loss_pallas(x, w1, w2):
        return jnp.sum(monarch_kernel(x, w1, w2).astype(jnp.float32) ** 2)

    def loss_xla(x, w1, w2):
        return jnp.sum(blockdiag_butterfly_multiply(x, w1, w2).astype(jnp.float32) ** 2)

    vg_p = jax.jit(jax.value_and_grad(loss_pallas, argnums=(0, 1, 2)))
    vg_x = jax.jit(jax.value_and_grad(loss_xla, argnums=(0, 1, 2)))

    t_pallas = _time(vg_p, x, w1, w2)
    t_xla = _time(vg_x, x, w1, w2)
    speedup = t_xla / t_pallas
    print(json.dumps({
        "metric": "monarch_fused_fwd_bwd_speedup_vs_xla",
        "value": round(speedup, 4),
        "unit": "x (pallas_us=%.1f xla_us=%.1f, seq1024 dim1024 nblocks4 blkr16 bf16)"
                % (t_pallas * 1e6, t_xla * 1e6),
        "vs_baseline": round(speedup / 1.2, 4),
    }))


if __name__ == "__main__":
    main()
