"""Experiment: can a tuned Pallas matmul beat XLA at the bench shape?

(2664, 4096) @ (4096, 4096), bf16, fp32 accumulate -> bf16 out.
Sweeps tile sizes; prints us/iter and TFLOP/s for each config vs XLA.
"""

import functools
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sparse_matrix_fine_tuning_tpu.utils.benchlib import time_fn


def make_mm(bm, bn, bk, dimnums=(((1,), (0,)), ((), ()))):
    def kernel(x_ref, w_ref, o_ref, acc):
        k = pl.program_id(2)

        @pl.when(k == 0)
        def _():
            acc[...] = jnp.zeros(acc.shape, acc.dtype)

        acc[...] += jax.lax.dot_general(
            x_ref[...], w_ref[...], dimension_numbers=dimnums,
            preferred_element_type=jnp.float32)

        @pl.when(k == pl.num_programs(2) - 1)
        def _():
            o_ref[...] = acc[...].astype(o_ref.dtype)

    def mm(x, w):
        b, n = x.shape
        m = w.shape[1]
        grid = (pl.cdiv(b, bm), pl.cdiv(m, bn), pl.cdiv(n, bk))
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((bm, bk), lambda i, j, k: (i, k)),
                pl.BlockSpec((bk, bn), lambda i, j, k: (k, j)),
            ],
            out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j)),
            out_shape=jax.ShapeDtypeStruct((b, m), x.dtype),
            scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary")),
        )(x, w)

    return mm


def main():
    B, N, M = 2664, 4096, 4096
    kx, kw = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.normal(kx, (B, N), jnp.bfloat16)
    w = jax.random.normal(kw, (N, M), jnp.bfloat16) * 0.02
    flops = 2 * B * N * M

    def xla_mm(x, w):
        return jnp.dot(x, w, preferred_element_type=jnp.float32).astype(x.dtype)

    t = time_fn(xla_mm, (x, w), iters=50)
    print(f"xla: {t*1e6:8.1f} us  {flops/t/1e12:6.1f} TF/s")

    for bm in (256, 512, 1024):
        for bn in (512, 1024, 2048):
            for bk in (512, 1024, 2048, 4096):
                vmem = (bm * bk + bk * bn) * 2 * 2 + bm * bn * (4 + 2 * 2)
                if vmem > 100 * 1024 * 1024:
                    continue
                try:
                    mm = make_mm(bm, bn, bk)
                    t = time_fn(mm, (x, w), iters=50)
                    print(f"pallas bm={bm} bn={bn} bk={bk}: {t*1e6:8.1f} us  "
                          f"{flops/t/1e12:6.1f} TF/s", flush=True)
                except Exception as e:
                    print(f"pallas bm={bm} bn={bn} bk={bk}: FAIL {type(e).__name__}",
                          flush=True)


if __name__ == "__main__":
    main()
