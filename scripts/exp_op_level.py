"""Experiment: standalone monarch op, Pallas fused vs XLA unfused.

fwd-only and fwd+bwd at several shapes; this is the apples-to-apples
analogue of the reference's demos/test_triton.py (op-only benchmark).
"""

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from sparse_matrix_fine_tuning_tpu.kernels.monarch_pallas import monarch_kernel
from sparse_matrix_fine_tuning_tpu.ops.monarch import blockdiag_butterfly_multiply
from sparse_matrix_fine_tuning_tpu.utils.benchlib import time_fn, time_grad_steps


def run(B, n, m, K, r, dtype=jnp.bfloat16):
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    x = jax.random.normal(ks[0], (B, n), dtype)
    w1 = jax.random.normal(ks[1], (K, r * K, n // K), dtype) * 0.02
    # l = K, s = m//K, rr = r*K  (square-ish monarch, KQ = K*K*r)
    w2 = jax.random.normal(ks[2], (K, m // K, r * K), dtype) * 0.02
    kq = K * K * r

    def loss_p(x, w1, w2):
        return jnp.sum(monarch_kernel(x, w1, w2).astype(jnp.float32) ** 2)

    def loss_x(x, w1, w2):
        return jnp.sum(blockdiag_butterfly_multiply(x, w1, w2).astype(jnp.float32) ** 2)

    tp_f = time_fn(lambda *a: monarch_kernel(*a), (x, w1, w2), iters=50, chain_argnum=1)
    tx_f = time_fn(lambda *a: blockdiag_butterfly_multiply(*a), (x, w1, w2), iters=50, chain_argnum=1)
    tp = time_grad_steps(loss_p, (x, w1, w2), argnums=(0, 1, 2), iters=50, chain_argnum=1)
    tx = time_grad_steps(loss_x, (x, w1, w2), argnums=(0, 1, 2), iters=50, chain_argnum=1)
    mb = (B * n + B * m) * 2 / 1e6
    print(f"B={B} n={n} m={m} K={K} r={r} kq={kq} ({mb:.0f}MB io): "
          f"fwd pallas={tp_f*1e6:6.1f}us xla={tx_f*1e6:6.1f}us ({tx_f/tp_f:4.2f}x) | "
          f"fwd+bwd pallas={tp*1e6:7.1f}us xla={tx*1e6:7.1f}us ({tx/tp:4.2f}x)",
          flush=True)


if __name__ == "__main__":
    for (B, n, m, K, r) in [
        (2664, 4096, 4096, 4, 4),
        (2664, 4096, 4096, 4, 16),
        (8192, 4096, 4096, 4, 4),
        (8192, 4096, 4096, 4, 16),
        (2664, 4096, 11264, 4, 8),
        (1024, 1024, 1024, 4, 16),
    ]:
        run(B, n, m, K, r)
