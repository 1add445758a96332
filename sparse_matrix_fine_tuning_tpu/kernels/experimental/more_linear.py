"""[EXPERIMENTAL -- bench-only, quarantined] Fused MonarchLinear
forward/backward: dense + adapter in one kernel.

Status: retired from the production path.  Under honest slope timing the
merged-training path (kernels/merged.py) beats this fully-fused design at
every measured shape (docs/BENCHMARKS.md); it is kept for benchmarking
(scripts/bench_more_linear.py) and future re-evaluation on other TPU
generations.  Nothing in the package or harnesses imports it.

The adapter layer's hot loop is ``y = x @ Wd^T + monarch(x)`` with Wd frozen
(reference monarch_linear.py:278-296).  Unfused, x is read twice (dense and
adapter paths), the adapter output is written and re-read for the add, and
the backward computes the same duplication.  This kernel fuses everything:

  forward:  one pass over x; the monarch epilogue uses the expanded
            permuted-dense factors (see monarch_pallas.py) accumulated in
            VMEM scratch alongside the dense tiles.
  backward: dx = dout @ Wd + (dout @ W2hat^T) @ W1bd^T fused in one kernel;
            a second kernel accumulates dW1bd/dW2hat over sequence tiles.
            Wd is FROZEN, so no dWd is ever computed or materialised --
            the structural win over autodiff through a shared dense matmul.

All matmuls run bf16 on the MXU with fp32 accumulation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sparse_matrix_fine_tuning_tpu.kernels.monarch_pallas import (
    _extract_dw,
    _vmem_budgets,
    expand_monarch_factors,
)

Array = jax.Array


def _tiles(b, n, m, itemsize):
    ts = 256 if (n + m) * itemsize > 8192 else 512
    ts = min(ts, max(128, ((b + 127) // 128) * 128))
    tn = min(n, 1024)
    tm = min(m, 1024)
    return ts, tn, tm


def _fwd_kernel(x_ref, wd_ref, w1bd_ref, w2hat_ref, out_ref, acc, out1):
    k = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(k == 0)
    def _init():
        acc[...] = jnp.zeros(acc.shape, acc.dtype)
        out1[...] = jnp.zeros(out1.shape, out1.dtype)

    x = x_ref[...]
    # dense partial: (ts, tk) x (tm, tk) -> (ts, tm)
    acc[...] += jax.lax.dot_general(
        x, wd_ref[...], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    # adapter stage-1 partial: (ts, tk) @ (tk, KQ)
    out1[...] += jax.lax.dot_general(
        x, w1bd_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(k == nk - 1)
    def _epilogue():
        mon = jax.lax.dot_general(
            out1[...].astype(x_ref.dtype), w2hat_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        out_ref[...] = (acc[...] + mon).astype(out_ref.dtype)


def _dx_kernel(dout_ref, wd_ref, w1bd_ref, w2hat_ref, dx_ref, acc, dout1):
    k = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(k == 0)
    def _init():
        acc[...] = jnp.zeros(acc.shape, acc.dtype)
        dout1[...] = jnp.zeros(dout1.shape, dout1.dtype)

    g = dout_ref[...]
    # dense grad partial: (ts, tm) @ (tm, tn)
    acc[...] += jax.lax.dot_general(
        g, wd_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    # adapter: dout1 += g @ W2hat^T  ((ts, tm) x (KQ, tm))
    dout1[...] += jax.lax.dot_general(
        g, w2hat_ref[...], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(k == nk - 1)
    def _epilogue():
        mon = jax.lax.dot_general(
            dout1[...].astype(dout_ref.dtype), w1bd_ref[...],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        dx_ref[...] = (acc[...] + mon).astype(dx_ref.dtype)


def _dw_kernel(x_ref, dout_ref, w1bd_ref, w2hat_ref, seqlen_ref,
               dw1bd_ref, dw2hat_ref):
    i = pl.program_id(0)
    ts = x_ref.shape[0]

    @pl.when(i == 0)
    def _init():
        dw1bd_ref[...] = jnp.zeros(dw1bd_ref.shape, dw1bd_ref.dtype)
        dw2hat_ref[...] = jnp.zeros(dw2hat_ref.shape, dw2hat_ref.dtype)

    valid = seqlen_ref[0] - i * ts
    rmask = jax.lax.broadcasted_iota(jnp.int32, (ts, 1), 0) < valid
    x = jnp.where(rmask, x_ref[...], 0)
    dout = jnp.where(rmask, dout_ref[...], 0)

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


def _more_fwd_call(x2d, wd, w1bd, w2hat, interpret):
    b, n = x2d.shape
    m = wd.shape[0]
    kq = w1bd.shape[1]
    ts, tn, tm = _tiles(b, n, m, x2d.dtype.itemsize)
    grid = (pl.cdiv(b, ts), pl.cdiv(m, tm), pl.cdiv(n, tn))
    return pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((ts, tn), lambda i, j, k: (i, k)),
            pl.BlockSpec((tm, tn), lambda i, j, k: (j, k)),
            pl.BlockSpec((tn, kq), lambda i, j, k: (k, 0)),
            pl.BlockSpec((kq, tm), lambda i, j, k: (0, j)),
        ],
        out_specs=pl.BlockSpec((ts, tm), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((b, m), x2d.dtype),
        scratch_shapes=[
            pltpu.VMEM((ts, tm), jnp.float32),
            pltpu.VMEM((ts, kq), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * m + 2 * b * kq * (n + m),
            bytes_accessed=(b * n + b * m + n * m) * x2d.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x2d, wd, w1bd, w2hat)


def _more_dx_call(dout2d, wd, w1bd, w2hat, interpret):
    b, m = dout2d.shape
    n = wd.shape[1]
    kq = w1bd.shape[1]
    ts, tn, tm = _tiles(b, n, m, dout2d.dtype.itemsize)
    grid = (pl.cdiv(b, ts), pl.cdiv(n, tn), pl.cdiv(m, tm))
    return pl.pallas_call(
        _dx_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((ts, tm), lambda i, j, k: (i, k)),
            # wd given as (m, n): block (tm, tn) at (k, j)
            pl.BlockSpec((tm, tn), lambda i, j, k: (k, j)),
            pl.BlockSpec((tn, kq), lambda i, j, k: (j, 0)),
            pl.BlockSpec((kq, tm), lambda i, j, k: (0, k)),
        ],
        out_specs=pl.BlockSpec((ts, tn), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((b, n), dout2d.dtype),
        scratch_shapes=[
            pltpu.VMEM((ts, tn), jnp.float32),
            pltpu.VMEM((ts, kq), jnp.float32),
        ],
        interpret=interpret,
    )(dout2d, wd, w1bd, w2hat)


def _more_dw_call(x2d, dout2d, w1bd, w2hat, interpret):
    b, n = x2d.shape
    m = dout2d.shape[1]
    kq = w1bd.shape[1]
    itemsize = x2d.dtype.itemsize
    fixed = (n * kq + kq * m) * 2 * (itemsize + 4)
    budget = _vmem_budgets()[1] - fixed
    ts = max(64, min(1024, (budget // (2 * (n + m) * itemsize)) // 64 * 64))
    grid = (pl.cdiv(b, ts),)
    seqlen = jnp.array([b], dtype=jnp.int32)
    return pl.pallas_call(
        _dw_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((ts, n), lambda i: (i, 0)),
            pl.BlockSpec((ts, m), lambda i: (i, 0)),
            pl.BlockSpec((n, kq), lambda i: (0, 0)),
            pl.BlockSpec((kq, m), lambda i: (0, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((n, kq), lambda i: (0, 0)),
            pl.BlockSpec((kq, m), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, kq), jnp.float32),
            jax.ShapeDtypeStruct((kq, m), jnp.float32),
        ],
        interpret=interpret,
    )(x2d, dout2d, w1bd, w2hat, seqlen)


@functools.lru_cache(maxsize=2)
def _more_linear_vjp(interpret: bool):
    @jax.custom_vjp
    def fn(x, wd, w1, w2):
        *batch, n = x.shape
        w1bd, w2hat = expand_monarch_factors(w1, w2)
        out = _more_fwd_call(x.reshape(-1, n), wd, w1bd, w2hat, interpret)
        return out.reshape(*batch, out.shape[-1])

    def fwd(x, wd, w1, w2):
        return fn(x, wd, w1, w2), (x, wd, w1, w2)

    def bwd(res, dout):
        x, wd, w1, w2 = res
        *batch, n = x.shape
        m = dout.shape[-1]
        w1bd, w2hat = expand_monarch_factors(w1, w2)
        d2 = dout.reshape(-1, m)
        x2 = x.reshape(-1, n)
        dx = _more_dx_call(d2, wd, w1bd, w2hat, interpret)
        dw1bd, dw2hat = _more_dw_call(x2, d2, w1bd, w2hat, interpret)
        dw1, dw2 = _extract_dw(dw1bd, dw2hat, w1.shape, w2.shape)
        # Wd is frozen: its cotangent is never needed, return zeros lazily
        return (dx.reshape(x.shape), jnp.zeros_like(wd),
                dw1.astype(w1.dtype), dw2.astype(w2.dtype))

    fn.defvjp(fwd, bwd)
    return fn


def more_linear(x: Array, dense_w: Array, w1: Array, w2: Array,
                interpret: bool = False) -> Array:
    """Fused ``x @ dense_w^T + monarch(x, w1, w2)``.

    dense_w: (m, n) FROZEN weight (no gradient is computed for it).
    w1 (K, Q, P), w2 (L, S, R) as in monarch_pallas; requires n == K*P and
    m == S*L (pre-padded shapes).
    """
    return _more_linear_vjp(bool(interpret))(x, dense_w, w1, w2)


def more_linear_supported(n: int, m: int, w1_shape, w2_shape,
                          itemsize: int = 2) -> bool:
    k, q, p = w1_shape
    l, s, r = w2_shape
    if k * p != n or s * l != m or l * r != k * q:
        return False
    kq = k * q
    return (n * kq + kq * m) * (itemsize + 4) <= _vmem_budgets()[0]
