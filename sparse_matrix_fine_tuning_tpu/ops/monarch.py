"""Core Monarch (block-diagonal butterfly) matrix multiply.

A Monarch matrix is the product ``P2 @ B2 @ P1 @ B1`` of two block-diagonal
matrices ``B1`` (k blocks of shape (q, p)) and ``B2`` (l blocks of shape
(s, r)) with fixed interleaving permutations between and after them.  This
module provides the TPU-native multiply for inputs against that implicit
matrix, written as two batched small matmuls plus index relayouts so XLA can
tile both contractions onto the MXU.

Semantics match the reference implementation's fast autograd path and its
einsum oracles (reference: src/ops/blockdiag_butterfly_multiply.py:61-196),
re-derived for JAX:

  x:  (..., n)      with n = k * p
  w1: (k, q, p)     first block-diagonal factor (each block right-multiplies
                    as x_blk @ w1_blk^T, i.e. "nn.Linear orientation")
  w2: (l, s, r)     second factor, requires l * r == k * q
  out: (..., s * l)

  out1 = cat_k(x_k @ w1_k^T)                     # (..., k*q)
  shuffle: view flat index (k*q) as (r, l)       # the butterfly interleave
  out2_l = out1_shuffled_l @ w2_l^T              # (..., s) per block l
  out flat index = (s, l)                        # second interleave

The same flat-index conventions make this multiply exactly consistent with
the SVD projection layouts in ``projection.py`` (factors (k, rank*j, i) and
(j, l, k*rank) produce ``x @ M^T`` for the projected dense M).

A ``jax.custom_vjp`` wraps the fast path so the backward saves only
``(x, w1, w2, out1)`` and computes dx/dw1/dw2 with three batched matmuls,
mirroring the reference's hand-written backward
(src/ops/blockdiag_butterfly_multiply.py:114-149) -- and so the whole op can
be swapped for the fused Pallas kernel in ``kernels/monarch_pallas.py``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def _pet(dtype):
    """preferred_element_type for MXU accumulation: fp32 for real floats,
    the input dtype for complex (XLA cannot accumulate complex into fp32)."""
    return jnp.complex64 if jnp.issubdtype(dtype, jnp.complexfloating) else jnp.float32


def _check_shapes(n: int, w1_shape, w2_shape) -> None:
    k, q, p = w1_shape
    l, s, r = w2_shape
    if k * p != n:
        raise ValueError(f"w1 {w1_shape} incompatible with input dim {n}: k*p={k * p}")
    if l * r != k * q:
        raise ValueError(f"w2 {w2_shape} incompatible with w1 {w1_shape}: l*r={l * r} != k*q={k * q}")


def monarch_dense_equivalent(w1: Array, w2: Array) -> Array:
    """Materialise the dense matrix M with monarch(x) == x @ M^T.

    Useful as a test oracle and for adapter merge.  Shape (s*l, k*p).
    Plays the role of the reference's block_diag-based oracle (version 3,
    src/ops/blockdiag_butterfly_multiply.py:189-196) and of
    ``convert_to_dense_weight`` (src/layers/structured_linear.py:50-53),
    computed directly rather than via an identity forward.
    """
    k, q, p = w1.shape
    l, s, r = w2.shape
    _check_shapes(k * p, w1.shape, w2.shape)
    kq = k * q
    # w2 as a permuted dense (s*l, k*q): row (s', l'), col j = r'*l + l'
    j_idx = jnp.arange(kq)
    r_idx = j_idx // l
    l_idx = j_idx % l
    rows = (jnp.arange(s)[:, None] * l + l_idx[None, :]).reshape(-1)
    cols = jnp.tile(j_idx, (s,))
    vals = w2[l_idx[None, :], jnp.arange(s)[:, None], r_idx[None, :]].reshape(-1)
    w2_perm = jnp.zeros((s * l, kq), dtype=w2.dtype).at[rows, cols].set(vals)
    # w1 as block-diagonal (k*q, k*p)
    w1_bd = jax.scipy.linalg.block_diag(*[w1[i] for i in range(k)]) if k > 1 else w1[0]
    return w2_perm @ w1_bd


def blockdiag_butterfly_multiply_reference(x: Array, w1: Array, w2: Array) -> Array:
    """Slow-but-obviously-correct einsum oracle (matches reference version 2,
    src/ops/blockdiag_butterfly_multiply.py:184-187)."""
    *batch, n = x.shape
    k, q, p = w1.shape
    l, s, r = w2.shape
    _check_shapes(n, w1.shape, w2.shape)
    xb = x.reshape(-1, k, p)
    out1 = jnp.einsum("kqp,bkp->bkq", w1, xb)
    # interleave: flat (k q) index re-read as (r, l), then block index l first
    out1 = out1.reshape(-1, k * q).reshape(-1, r, l).transpose(0, 2, 1)
    out2 = jnp.einsum("lsr,blr->bsl", w2, out1)
    return out2.reshape(*batch, s * l)


def _monarch_fwd_impl(x: Array, w1: Array, w2: Array):
    """Fast forward: two MXU contractions + relayout.

    Returns (out, out1) where out1 is the post-shuffle intermediate
    (B, l, r) saved for the backward's dw2 matmul.
    """
    *batch, n = x.shape
    k, q, p = w1.shape
    l, s, r = w2.shape
    pet = _pet(x.dtype)
    xb = x.reshape(-1, k, p)
    # (k, b, q): batched over the k blocks; XLA lowers to one bmm on the MXU.
    out1 = jax.lax.dot_general(
        xb, w1,
        dimension_numbers=(((2,), (2,)), ((1,), (0,))),
        preferred_element_type=pet,
    )  # (k, b, q)
    out1 = out1.transpose(1, 0, 2).reshape(-1, r, l).transpose(0, 2, 1)  # (b, l, r)
    out1 = out1.astype(x.dtype)
    out2 = jax.lax.dot_general(
        out1, w2,
        dimension_numbers=(((2,), (2,)), ((1,), (0,))),
        preferred_element_type=pet,
    )  # (l, b, s)
    out2 = out2.astype(x.dtype)
    out = out2.transpose(1, 2, 0).reshape(*batch, s * l)  # flat index = (s, l)
    return out, out1


@jax.custom_vjp
def blockdiag_butterfly_multiply(x: Array, w1: Array, w2: Array) -> Array:
    """Monarch multiply: ``out = x @ Monarch(w1, w2)^T``.

    Args:
      x: (..., n) input, n = k * p.
      w1: (k, q, p) first block-diagonal factor.
      w2: (l, s, r) second factor with l * r == k * q.
    Returns:
      (..., s * l).
    """
    out, _ = _monarch_fwd_impl(x, w1, w2)
    return out


def _bbm_fwd(x, w1, w2):
    out, out1 = _monarch_fwd_impl(x, w1, w2)
    return out, (x, w1, w2, out1)


def monarch_dw(x: Array, dout: Array, w1: Array, w2: Array,
               out1: Array | None = None):
    """Factor gradients (dw1, dw2) of the monarch multiply from the layer
    input and output cotangent alone -- the skinny memory-bound pass shared
    by the autograd backward and the merged-training backward
    (kernels/merged.py).  ``out1``: optionally pass the saved post-shuffle
    intermediate (b, l, r); recomputed from x otherwise.

    Also returns dout1_kq (b, k, q) so callers that need dx can finish it
    with one more batched matmul."""
    *batch, n = x.shape
    k, q, p = w1.shape
    l, s, r = w2.shape
    pet = _pet(x.dtype)
    xb = x.reshape(-1, k, p)
    if out1 is None:
        o1 = jax.lax.dot_general(
            xb, w1, dimension_numbers=(((2,), (2,)), ((1,), (0,))),
            preferred_element_type=pet)  # (k, b, q)
        out1 = o1.transpose(1, 0, 2).reshape(-1, r, l).transpose(0, 2, 1)
        out1 = out1.astype(x.dtype)  # (b, l, r)
    # Keep the (B, s*l) cotangent in its natural layout and hand dot_general
    # the batch/contract dims in place: the big operand is never materialized
    # transposed (any relayout is XLA's internal tiling choice).  Measured
    # ~7% cheaper dw marginal inside the ga=16 recipe scan vs the explicit
    # (l, b, s) transpose -- scripts/exp_dw_in_context.py "block_nt".
    d3 = dout.reshape(-1, s, l).astype(x.dtype)  # (b, s, l) -- pure reshape
    # dw2[l, s, r] = sum_b dout[b, s, l] * out1[b, l, r]  (JAX vjp = pure transpose, no conj)
    dw2 = jax.lax.dot_general(
        d3, out1,
        dimension_numbers=(((0,), (0,)), ((2,), (1,))),
        preferred_element_type=pet,
    )  # (l, s, r)
    # dout1[l, b, r] = sum_s dout[b, s, l] * w2[l, s, r]
    dout1 = jax.lax.dot_general(
        d3, w2,
        dimension_numbers=(((1,), (1,)), ((2,), (0,))),
        preferred_element_type=pet,
    )  # (l, b, r)
    dout1 = dout1.astype(x.dtype)
    # undo shuffle: (b, l, r) -> (b, (r l)) == (b, (k q)) -> (b, k, q)
    dout1_kq = dout1.transpose(1, 2, 0).reshape(-1, k, q)
    # dw1[k, q, p] = sum_b dout1[b, k, q] * x[b, k, p]
    dw1 = jax.lax.dot_general(
        dout1_kq, xb,
        dimension_numbers=(((0,), (0,)), ((1,), (1,))),
        preferred_element_type=pet,
    )  # (k, q, p)
    return dw1.astype(w1.dtype), dw2.astype(w2.dtype), dout1_kq


def _bbm_bwd(res, dout):
    x, w1, w2, out1 = res
    *batch, n = x.shape
    k, q, p = w1.shape
    pet = _pet(x.dtype)
    dw1, dw2, dout1_kq = monarch_dw(x, dout, w1, w2, out1=out1)
    # dx[b, k, p] = sum_q dout1[b, k, q] * w1[k, q, p]
    dx = jax.lax.dot_general(
        dout1_kq, w1,
        dimension_numbers=(((2,), (1,)), ((1,), (0,))),
        preferred_element_type=pet,
    )  # (k, b, p)
    dx = dx.astype(x.dtype).transpose(1, 0, 2).reshape(*batch, n)
    return dx, dw1, dw2


blockdiag_butterfly_multiply.defvjp(_bbm_fwd, _bbm_bwd)
