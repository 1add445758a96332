"""Benchmark entry point (run by the driver on real TPU hardware).

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Headline: full MonarchLinear layer fwd+bwd (frozen dense + adapter, the
fine-tuning hot loop) at the Llama-7B projection shape (2664 x 4096 -> 4096,
nblocks 4 blk_r 4 -- reference blockdiag_butterfly_multiply.py:89): the
fused path (XLA dense + Pallas monarch with fused residual add) vs the
all-XLA path.  vs_baseline normalises by the reference Triton kernel's
~1.2x claim over its optimized PyTorch path (README.md:11).

Timing integrity: repeat-call timing through the remote runtime is
unreliable (identical executions can be elided and block_until_ready can
return early), so iterations run inside one lax.fori_loop with a chained
data dependency and the final scalar is fetched to host
(utils/benchlib.py).
"""

import json
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def main():
    from sparse_matrix_fine_tuning_tpu.kernels.monarch_pallas import monarch_add
    from sparse_matrix_fine_tuning_tpu.ops.monarch import blockdiag_butterfly_multiply
    from sparse_matrix_fine_tuning_tpu.utils.benchlib import time_grad_steps

    dtype = jnp.bfloat16

    def dense(x, wd):
        return jax.lax.dot_general(
            x, wd, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32).astype(x.dtype)

    B, n, m, K, r = 2664, 4096, 4096, 4, 4
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    x = jax.random.normal(ks[0], (B, n), dtype)
    wd = jax.random.normal(ks[1], (m, n), dtype) * 0.02
    w1 = jax.random.normal(ks[2], (K, r, n // K), dtype) * 0.02
    w2 = jax.random.normal(ks[3], (K, m // K, r), dtype) * 0.02

    def loss_fused(x, wd, w1, w2):
        return jnp.sum(monarch_add(dense(x, wd), x, w1, w2).astype(jnp.float32) ** 2)

    def loss_xla(x, wd, w1, w2):
        y = dense(x, wd) + blockdiag_butterfly_multiply(x, w1, w2)
        return jnp.sum(y.astype(jnp.float32) ** 2)

    def loss_dense(x, wd, w1, w2):
        return jnp.sum(dense(x, wd).astype(jnp.float32) ** 2)

    args = (x, wd, w1, w2)
    # interleave rounds and take medians: single-shot timings through the
    # tunnel vary +-10%
    import statistics
    fused_ts, xla_ts, dense_ts = [], [], []
    for _ in range(3):
        fused_ts.append(time_grad_steps(loss_fused, args, argnums=(0, 2, 3), iters=30))
        xla_ts.append(time_grad_steps(loss_xla, args, argnums=(0, 2, 3), iters=30))
        dense_ts.append(time_grad_steps(loss_dense, args, argnums=(0,), iters=30))
    t_fused = statistics.median(fused_ts)
    t_xla = statistics.median(xla_ts)
    t_dense = statistics.median(dense_ts)
    speedup = t_xla / t_fused
    overhead_fused = t_fused / t_dense - 1
    overhead_xla = t_xla / t_dense - 1

    print(json.dumps({
        "metric": "monarch_linear_layer_fwd_bwd_speedup_vs_xla",
        "value": round(speedup, 4),
        "unit": ("x (fused=%.0fus xla=%.0fus dense-only=%.0fus; adapter adds "
                 "%.0f%% over bare dense vs %.0f%% unfused; 2664x4096 blkr4 bf16)"
                 % (t_fused * 1e6, t_xla * 1e6, t_dense * 1e6,
                    overhead_fused * 100, overhead_xla * 100)),
        "vs_baseline": round(speedup / 1.2, 4),
    }))


if __name__ == "__main__":
    main()
