"""Ops correctness: fast Monarch multiply vs einsum oracle, fwd + grads.

Mirrors the reference test strategy (tests/ops/test_blockdiag_butterfly_multiply.py):
slow-but-correct reference vs fast implementation, outputs and dx/dw1/dw2,
square and rectangular shapes, real and complex dtypes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparse_matrix_fine_tuning_tpu.ops.monarch import (
    blockdiag_butterfly_multiply,
    blockdiag_butterfly_multiply_reference,
    monarch_dense_equivalent,
)

# (batch, w1 (k,q,p), w2 (l,s,r)) shape cases
CASES = [
    (3, (4, 4, 4), (4, 4, 4)),          # square sqrt(n), n=16
    (5, (4, 8, 16), (4, 12, 8)),        # rectangular
    (2, (8, 2, 4), (2, 10, 8)),         # k != l
    (7, (4, 4, 64), (4, 96, 4)),        # adapter shape: nblocks=4, blk_r=4
    (1, (2, 16, 8), (4, 3, 8)),         # l > k
]


def _rand(key, shape, dtype):
    if jnp.issubdtype(dtype, jnp.complexfloating):
        kr, ki = jax.random.split(key)
        return (jax.random.normal(kr, shape) + 1j * jax.random.normal(ki, shape)).astype(dtype)
    return jax.random.normal(key, shape, dtype=dtype)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.complex64])
@pytest.mark.parametrize("batch,w1_shape,w2_shape", CASES)
def test_forward_matches_reference(batch, w1_shape, w2_shape, dtype):
    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    n = w1_shape[0] * w1_shape[2]
    x = _rand(keys[0], (batch, n), dtype)
    w1 = _rand(keys[1], w1_shape, dtype)
    w2 = _rand(keys[2], w2_shape, dtype)
    ref = blockdiag_butterfly_multiply_reference(x, w1, w2)
    fast = blockdiag_butterfly_multiply(x, w1, w2)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("batch,w1_shape,w2_shape", CASES)
def test_dense_equivalent(batch, w1_shape, w2_shape):
    keys = jax.random.split(jax.random.PRNGKey(1), 3)
    n = w1_shape[0] * w1_shape[2]
    x = _rand(keys[0], (batch, n), jnp.float32)
    w1 = _rand(keys[1], w1_shape, jnp.float32)
    w2 = _rand(keys[2], w2_shape, jnp.float32)
    dense = monarch_dense_equivalent(w1, w2)
    expected = x @ dense.T
    got = blockdiag_butterfly_multiply(x, w1, w2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.complex64])
@pytest.mark.parametrize("batch,w1_shape,w2_shape", CASES)
def test_grads_match_reference(batch, w1_shape, w2_shape, dtype):
    keys = jax.random.split(jax.random.PRNGKey(2), 4)
    n = w1_shape[0] * w1_shape[2]
    m = w2_shape[0] * w2_shape[1]
    x = _rand(keys[0], (batch, n), dtype)
    w1 = _rand(keys[1], w1_shape, dtype)
    w2 = _rand(keys[2], w2_shape, dtype)
    cot = _rand(keys[3], (batch, m), dtype)

    def loss_fast(x, w1, w2):
        out = blockdiag_butterfly_multiply(x, w1, w2)
        return jnp.sum(jnp.real(out * cot.conj()))

    def loss_ref(x, w1, w2):
        out = blockdiag_butterfly_multiply_reference(x, w1, w2)
        return jnp.sum(jnp.real(out * cot.conj()))

    g_fast = jax.grad(loss_fast, argnums=(0, 1, 2))(x, w1, w2)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(x, w1, w2)
    for a, b in zip(g_fast, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)


def test_batch_dims_preserved():
    keys = jax.random.split(jax.random.PRNGKey(3), 3)
    w1 = _rand(keys[1], (4, 4, 8), jnp.float32)
    w2 = _rand(keys[2], (4, 8, 4), jnp.float32)
    x = _rand(keys[0], (2, 5, 32), jnp.float32)
    out = blockdiag_butterfly_multiply(x, w1, w2)
    assert out.shape == (2, 5, 32)
    flat = blockdiag_butterfly_multiply(x.reshape(10, 32), w1, w2)
    np.testing.assert_allclose(np.asarray(out.reshape(10, 32)), np.asarray(flat), rtol=1e-5)


def test_bf16_compute():
    keys = jax.random.split(jax.random.PRNGKey(4), 3)
    x = _rand(keys[0], (16, 64), jnp.float32).astype(jnp.bfloat16)
    w1 = _rand(keys[1], (4, 8, 16), jnp.bfloat16)
    w2 = _rand(keys[2], (4, 24, 8), jnp.bfloat16)
    out = blockdiag_butterfly_multiply(x, w1, w2)
    assert out.dtype == jnp.bfloat16
    ref = blockdiag_butterfly_multiply_reference(
        x.astype(jnp.float32), w1.astype(jnp.float32), w2.astype(jnp.float32)
    )
    np.testing.assert_allclose(np.asarray(out, dtype=np.float32), np.asarray(ref), rtol=5e-2, atol=5e-2)


def test_jit_compatible():
    keys = jax.random.split(jax.random.PRNGKey(5), 3)
    x = _rand(keys[0], (8, 32), jnp.float32)
    w1 = _rand(keys[1], (4, 4, 8), jnp.float32)
    w2 = _rand(keys[2], (4, 8, 4), jnp.float32)
    jitted = jax.jit(blockdiag_butterfly_multiply)
    np.testing.assert_allclose(
        np.asarray(jitted(x, w1, w2)),
        np.asarray(blockdiag_butterfly_multiply(x, w1, w2)),
        rtol=1e-5, atol=1e-5,
    )
