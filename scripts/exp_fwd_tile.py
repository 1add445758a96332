"""Why is the fused monarch fwd 6x off roofline? Differential timing:
harness overhead, tile-size sweep, weight-layout variants."""

import functools
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sparse_matrix_fine_tuning_tpu.kernels.monarch_pallas import (
    expand_monarch_factors,
)
from sparse_matrix_fine_tuning_tpu.ops.monarch import blockdiag_butterfly_multiply
from sparse_matrix_fine_tuning_tpu.utils.benchlib import time_fn


def fwd_call(ts, x2d, w1bd, w2hat):
    b, n = x2d.shape
    kq = w1bd.shape[1]
    m = w2hat.shape[1]

    def kernel(x_ref, w1_ref, w2_ref, o_ref):
        out1 = jnp.dot(x_ref[...], w1_ref[...], preferred_element_type=jnp.float32)
        o_ref[...] = jnp.dot(out1.astype(x_ref.dtype), w2_ref[...],
                             preferred_element_type=jnp.float32).astype(o_ref.dtype)

    return pl.pallas_call(
        kernel,
        grid=(pl.cdiv(b, ts),),
        in_specs=[
            pl.BlockSpec((ts, n), lambda i: (i, 0)),
            pl.BlockSpec((n, kq), lambda i: (0, 0)),
            pl.BlockSpec((kq, m), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((ts, m), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((b, m), x2d.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(x2d, w1bd, w2hat)


def main():
    B, n, m, K, r = 2664, 4096, 4096, 4, 4
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    x = jax.random.normal(ks[0], (B, n), jnp.bfloat16)
    w1 = jax.random.normal(ks[1], (K, r * K, n // K), jnp.bfloat16) * 0.02
    w2 = jax.random.normal(ks[2], (K, m // K, r * K), jnp.bfloat16) * 0.02
    w1bd, w2hat = expand_monarch_factors(w1, w2)
    w1bd, w2hat = jax.device_put(w1bd), jax.device_put(w2hat)
    kq = w1bd.shape[1]
    print(f"kq={kq}")

    t = time_fn(lambda x: x * 1.0000001, (x,), iters=50)
    print(f"harness+copy floor: {t*1e6:7.1f} us")

    t = time_fn(lambda x, a, b_: blockdiag_butterfly_multiply(x, a, b_),
                (x, w1, w2), iters=50)
    print(f"xla unfused fwd:    {t*1e6:7.1f} us")

    # xla with pre-expanded weights (two plain matmuls, intermediate in HBM)
    def xla_expanded(x, w1bd, w2hat):
        o1 = jnp.dot(x, w1bd, preferred_element_type=jnp.float32).astype(x.dtype)
        return jnp.dot(o1, w2hat, preferred_element_type=jnp.float32).astype(x.dtype)

    t = time_fn(xla_expanded, (x, w1bd, w2hat), iters=50)
    print(f"xla expanded fwd:   {t*1e6:7.1f} us")

    for ts in (256, 512, 1024, 2048, 2664):
        ts_r = min(ts, B)
        try:
            f = functools.partial(fwd_call, ts_r)
            t = time_fn(f, (x, w1bd, w2hat), iters=50)
            print(f"pallas fwd ts={ts_r:5d}: {t*1e6:7.1f} us", flush=True)
        except Exception as e:
            print(f"pallas fwd ts={ts_r:5d}: FAIL {type(e).__name__}: {e}",
                  flush=True)


if __name__ == "__main__":
    main()
