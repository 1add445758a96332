"""Classic butterfly-factor utilities (legacy surface from HazyResearch/fly).

Kept for inventory parity with the reference's ``butterfly_factor.py`` and
``block_butterfly_multiply.py`` (reference src/ops/butterfly_factor.py:7-25,
src/ops/block_butterfly_multiply.py:6-73).  Not on the MoRe training path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def butterfly_factor_to_matrix(twiddle: Array, factor_index: int) -> Array:
    """Materialise one classic butterfly factor as a dense (n, n) matrix.

    Args:
      twiddle: (n // 2, 2, 2) twiddle entries for this factor.
      factor_index: which factor in the log2(n) product; stride = 2**factor_index.
    """
    half_n, _, _ = twiddle.shape
    n = half_n * 2
    stride = 1 << factor_index
    # index blocks: for each "butterfly" pair (i, i + stride) within groups of 2*stride
    mat = jnp.zeros((n, n), dtype=twiddle.dtype)
    t = twiddle.reshape(n // (2 * stride), stride, 2, 2)
    for g in range(n // (2 * stride)):
        base = g * 2 * stride
        for s in range(stride):
            i0, i1 = base + s, base + stride + s
            tw = t[g, s]
            mat = mat.at[i0, i0].set(tw[0, 0])
            mat = mat.at[i0, i1].set(tw[0, 1])
            mat = mat.at[i1, i0].set(tw[1, 0])
            mat = mat.at[i1, i1].set(tw[1, 1])
    return mat


def block_butterfly_factor_multiply(twiddle: Array, x: Array, factor_index: int) -> Array:
    """Apply one block-butterfly factor.

    Args:
      twiddle: (nstacks, n // 2, 2, 2, bs, bs) block twiddles.
      x: (batch, nstacks, n, bs)
      factor_index: stride = 2**factor_index over the n dimension.
    Returns: (batch, nstacks, n, bs)
    """
    b, nstacks, n, bs = x.shape
    stride = 1 << factor_index
    xv = x.reshape(b, nstacks, n // (2 * stride), 2, stride, bs)
    tv = twiddle.reshape(nstacks, n // (2 * stride), stride, 2, 2, bs, bs)
    # out[..., i, ...] = sum_j tw[i, j] @ x[..., j, ...]
    out = jnp.einsum("s g t i j p q, b s g j t q -> b s g i t p", tv, xv)
    return out.reshape(b, nstacks, n, bs)


def block_butterfly_multiply(twiddle: Array, x: Array, increasing_stride: bool = True) -> Array:
    """Product of log2(n) block-butterfly factors.

    Args:
      twiddle: (nstacks, log_n, n // 2, 2, 2, bs, bs)
      x: (batch, nstacks, n, bs)
    """
    log_n = twiddle.shape[1]
    order = range(log_n) if increasing_stride else range(log_n - 1, -1, -1)
    for idx in order:
        x = block_butterfly_factor_multiply(twiddle[:, idx], x, idx)
    return x
