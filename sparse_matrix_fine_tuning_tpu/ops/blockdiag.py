"""Single block-diagonal factor multiply.

The one-factor version of the Monarch product: applies k independent
(q, p) blocks to the k contiguous p-chunks of the input.  Used by
``MonarchFactor`` (ReFT rotations) and the multiplicative-factor option of
``MonarchLinear``.  Mirrors the reference's ``BlockdiagMultiply`` /
``single_monarch_mult`` (src/ops/blockdiag_butterfly_multiply.py:10-58 and
src/ops/blockdiag_multiply.py:6-78) as a jnp op with custom VJP.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def _pet(dtype):
    return jnp.complex64 if jnp.issubdtype(dtype, jnp.complexfloating) else jnp.float32


def blockdiag_multiply_reference(x: Array, weight: Array) -> Array:
    """Einsum oracle (reference src/ops/blockdiag_multiply.py:24-38)."""
    *batch, n = x.shape
    k, q, p = weight.shape
    assert k * p == n, f"weight {weight.shape} incompatible with input dim {n}"
    xb = x.reshape(-1, k, p)
    out = jnp.einsum("kqp,bkp->bkq", weight, xb)
    return out.reshape(*batch, k * q)


@jax.custom_vjp
def blockdiag_multiply(x: Array, weight: Array) -> Array:
    """out[..., (k q)] = x[..., (k p)] applied blockwise: x_k @ w_k^T."""
    *batch, n = x.shape
    k, q, p = weight.shape
    xb = x.reshape(-1, k, p)
    out = jax.lax.dot_general(
        xb, weight,
        dimension_numbers=(((2,), (2,)), ((1,), (0,))),
        preferred_element_type=_pet(x.dtype),
    )  # (k, b, q)
    return out.astype(x.dtype).transpose(1, 0, 2).reshape(*batch, k * q)


def _bd_fwd(x, weight):
    return blockdiag_multiply(x, weight), (x, weight)


def _bd_bwd(res, dout):
    x, weight = res
    *batch, n = x.shape
    k, q, p = weight.shape
    pet = _pet(x.dtype)
    db = dout.reshape(-1, k, q)
    # dx[b, k, p] = sum_q dout[b, k, q] w[k, q, p]
    dx = jax.lax.dot_general(
        db, weight,
        dimension_numbers=(((2,), (1,)), ((1,), (0,))),
        preferred_element_type=pet,
    )  # (k, b, p)
    dx = dx.astype(x.dtype).transpose(1, 0, 2).reshape(*batch, n)
    # dw[k, q, p] = sum_b dout[b, k, q] x[b, k, p]
    xb = x.reshape(-1, k, p)
    dw = jax.lax.dot_general(
        db, xb,
        dimension_numbers=(((0,), (0,)), ((1,), (1,))),
        preferred_element_type=pet,
    )
    return dx, dw.astype(weight.dtype)


blockdiag_multiply.defvjp(_bd_fwd, _bd_bwd)


def blockdiag_weight_to_dense_weight(weight: Array) -> Array:
    """Dense (k*q, k*p) equivalent of a block-diagonal weight
    (reference src/ops/blockdiag_multiply.py:6-17)."""
    k = weight.shape[0]
    return jax.scipy.linalg.block_diag(*[weight[i] for i in range(k)]) if k > 1 else weight[0]
