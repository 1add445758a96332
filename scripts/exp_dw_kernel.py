"""Why is the pallas dw kernel 4x off roofline?  Standalone variants.

dw pass: given x (B, n), dout (B, m), expanded w1bd (n, kq), w2hat (kq, m):
  out1 = x @ w1bd; dw2hat = out1^T @ dout; dout1 = dout @ w2hat^T;
  dw1bd = x^T @ dout1.
Minimal traffic = read x + dout = 44 MB ~= 54 us.
"""

import functools
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sparse_matrix_fine_tuning_tpu.kernels.monarch_pallas import expand_monarch_factors
from sparse_matrix_fine_tuning_tpu.kernels.experimental.more_linear import _more_dw_call
from sparse_matrix_fine_tuning_tpu.utils.benchlib import time_fn


def dw_kernel_v2(ts, mask, semantics):
    def kernel(x_ref, dout_ref, w1bd_ref, w2hat_ref, dw1bd_ref, dw2hat_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            dw1bd_ref[...] = jnp.zeros(dw1bd_ref.shape, dw1bd_ref.dtype)
            dw2hat_ref[...] = jnp.zeros(dw2hat_ref.shape, dw2hat_ref.dtype)

        x = x_ref[...]
        dout = dout_ref[...]
        out1 = jnp.dot(x, w1bd_ref[...], preferred_element_type=jnp.float32
                       ).astype(x.dtype)
        dw2hat_ref[...] += jax.lax.dot_general(
            out1, dout, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dout1 = jax.lax.dot_general(
            dout, w2hat_ref[...], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32).astype(x.dtype)
        dw1bd_ref[...] += jax.lax.dot_general(
            x, dout1, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    def call(x2d, dout2d, w1bd, w2hat):
        b, n = x2d.shape
        m = dout2d.shape[1]
        kq = w1bd.shape[1]
        return pl.pallas_call(
            kernel,
            grid=(pl.cdiv(b, ts),),
            in_specs=[
                pl.BlockSpec((ts, n), lambda i: (i, 0)),
                pl.BlockSpec((ts, m), lambda i: (i, 0)),
                pl.BlockSpec((n, kq), lambda i: (0, 0)),
                pl.BlockSpec((kq, m), lambda i: (0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((n, kq), lambda i: (0, 0)),
                pl.BlockSpec((kq, m), lambda i: (0, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((n, kq), jnp.float32),
                jax.ShapeDtypeStruct((kq, m), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=(semantics,)),
            interpret=False,
        )(x2d, dout2d, w1bd, w2hat)

    return call


def jnp_dw(x, dout, w1bd, w2hat):
    out1 = jnp.dot(x, w1bd, preferred_element_type=jnp.float32).astype(x.dtype)
    dw2hat = jax.lax.dot_general(out1, dout, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    dout1 = jax.lax.dot_general(dout, w2hat, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32).astype(x.dtype)
    dw1bd = jax.lax.dot_general(x, dout1, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    return dw1bd, dw2hat


def main():
    B, n, m, K, r = 2664, 4096, 4096, 4, 4
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    x = jax.random.normal(ks[0], (B, n), jnp.bfloat16)
    dout = jax.random.normal(ks[1], (B, m), jnp.bfloat16)
    w1 = jax.random.normal(ks[2], (K, r * K, n // K), jnp.bfloat16) * 0.02
    w2 = jax.random.normal(ks[3], (K, m // K, r * K), jnp.bfloat16) * 0.02
    w1bd, w2hat = expand_monarch_factors(w1, w2)
    w1bd, w2hat = jax.device_put(w1bd), jax.device_put(w2hat)

    def t(fn, label):
        try:
            tt = time_fn(lambda x, w1bd, *rest: fn(x, rest[1], w1bd, rest[0]),
                         (x, w1bd, w2hat, dout), iters=100, chain_argnum=1)
            print(f"{label:34s}: {tt*1e6:7.1f} us", flush=True)
        except Exception as e:
            print(f"{label:34s}: FAIL {type(e).__name__} {str(e)[:120]}", flush=True)

    t(lambda x, d, a, b_: jnp_dw(x, d, a, b_), "jnp dw (4 XLA dots)")
    t(lambda x, d, a, b_: _more_dw_call(x, d, a, b_, False), "existing _more_dw_call")
    for ts in (256, 512, 1024):
        for sem in ("arbitrary",):
            t(dw_kernel_v2(ts, False, sem), f"v2 ts={ts} {sem}")


if __name__ == "__main__":
    main()
