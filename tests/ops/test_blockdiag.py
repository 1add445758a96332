import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparse_matrix_fine_tuning_tpu.ops.blockdiag import (
    blockdiag_multiply,
    blockdiag_multiply_reference,
    blockdiag_weight_to_dense_weight,
)


@pytest.mark.parametrize("batch,shape", [(4, (4, 4, 4)), (3, (2, 8, 16)), (6, (8, 3, 5))])
def test_forward_matches_reference(batch, shape):
    k, q, p = shape
    keys = jax.random.split(jax.random.PRNGKey(0), 2)
    x = jax.random.normal(keys[0], (batch, k * p))
    w = jax.random.normal(keys[1], shape)
    np.testing.assert_allclose(
        np.asarray(blockdiag_multiply(x, w)),
        np.asarray(blockdiag_multiply_reference(x, w)),
        rtol=1e-5, atol=1e-5,
    )


def test_dense_equivalent():
    keys = jax.random.split(jax.random.PRNGKey(1), 2)
    w = jax.random.normal(keys[0], (4, 6, 8))
    x = jax.random.normal(keys[1], (5, 32))
    dense = blockdiag_weight_to_dense_weight(w)
    assert dense.shape == (24, 32)
    np.testing.assert_allclose(
        np.asarray(blockdiag_multiply(x, w)), np.asarray(x @ dense.T), rtol=1e-5, atol=1e-5
    )


def test_grads_match_autodiff_of_reference():
    keys = jax.random.split(jax.random.PRNGKey(2), 3)
    x = jax.random.normal(keys[0], (4, 32))
    w = jax.random.normal(keys[1], (4, 8, 8))
    cot = jax.random.normal(keys[2], (4, 32))

    g1 = jax.grad(lambda x, w: jnp.sum(blockdiag_multiply(x, w) * cot), argnums=(0, 1))(x, w)
    g2 = jax.grad(lambda x, w: jnp.sum(blockdiag_multiply_reference(x, w) * cot), argnums=(0, 1))(x, w)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)
