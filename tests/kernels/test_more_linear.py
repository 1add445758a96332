"""Fused dense+Monarch kernel vs reference composition (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparse_matrix_fine_tuning_tpu.kernels.experimental.more_linear import (
    more_linear,
    more_linear_supported,
)
from sparse_matrix_fine_tuning_tpu.ops.monarch import blockdiag_butterfly_multiply

CASES = [
    # (batch, n, m, K, r)
    (32, 64, 64, 4, 4),
    (200, 128, 96, 4, 8),   # ragged batch + rectangular
    (64, 96, 192, 4, 4),
]


def _mk(b, n, m, K, r, seed=0):
    keys = jax.random.split(jax.random.PRNGKey(seed), 4)
    x = jax.random.normal(keys[0], (b, n))
    wd = jax.random.normal(keys[1], (m, n)) * 0.1
    w1 = jax.random.normal(keys[2], (K, r, n // K)) * 0.1
    w2 = jax.random.normal(keys[3], (K, m // K, r)) * 0.1
    return x, wd, w1, w2


def _ref(x, wd, w1, w2):
    return x @ wd.T + blockdiag_butterfly_multiply(x, w1, w2)


@pytest.mark.parametrize("b,n,m,K,r", CASES)
def test_forward(b, n, m, K, r):
    x, wd, w1, w2 = _mk(b, n, m, K, r)
    assert more_linear_supported(n, m, w1.shape, w2.shape)
    got = more_linear(x, wd, w1, w2, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(_ref(x, wd, w1, w2)),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("b,n,m,K,r", CASES)
def test_grads(b, n, m, K, r):
    x, wd, w1, w2 = _mk(b, n, m, K, r, seed=1)
    cot = jax.random.normal(jax.random.PRNGKey(9), (b, m))

    def loss_fused(x, w1, w2):
        return jnp.sum(more_linear(x, wd, w1, w2, interpret=True) * cot)

    def loss_ref(x, w1, w2):
        return jnp.sum(_ref(x, wd, w1, w2) * cot)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(x, w1, w2)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, w1, w2)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-4)


def test_3d_batch():
    x, wd, w1, w2 = _mk(24, 64, 64, 4, 4, seed=2)
    x3 = x.reshape(2, 12, 64)
    out = more_linear(x3, wd, w1, w2, interpret=True)
    assert out.shape == (2, 12, 64)
    np.testing.assert_allclose(np.asarray(out.reshape(24, 64)),
                               np.asarray(_ref(x, wd, w1, w2)),
                               rtol=1e-4, atol=1e-4)
