"""SVD projection round-trips and FFT-as-Monarch exactness.

Mirrors reference tests/ops/test_blockdiag_butterfly_projection.py and
test_blockdiag_butterfly_einsum.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparse_matrix_fine_tuning_tpu.ops.monarch import (
    blockdiag_butterfly_multiply,
    monarch_dense_equivalent,
)
from sparse_matrix_fine_tuning_tpu.ops.projection import (
    blockdiag_butterfly_multiply_einsum_rank,
    blockdiag_butterfly_project,
    blockdiag_butterfly_project_einsum_rank,
    butterfly_fft_factors,
    factors,
    low_rank_project,
)


def test_low_rank_project_full_rank_exact():
    M = jax.random.normal(jax.random.PRNGKey(0), (3, 8, 8))
    U, Vt = low_rank_project(M, rank=8)
    np.testing.assert_allclose(np.asarray(U @ Vt), np.asarray(M), rtol=1e-4, atol=1e-4)


def test_low_rank_project_reverse_decomposition():
    M = jax.random.normal(jax.random.PRNGKey(1), (8, 8))
    U, Vt, U_rev, Vt_rev = low_rank_project(M, rank=3, reverse=True)
    np.testing.assert_allclose(np.asarray(U @ Vt + U_rev @ Vt_rev), np.asarray(M), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("m,n,k,j,rank", [
    (16, 16, 4, 4, 4),     # square, full block rank -> exact
    (32, 16, 4, 4, 4),     # rectangular, full rank (min(l,i)=4... l=8,i=4)
    (24, 32, 4, 2, 2),     # rank-truncated
])
def test_projection_roundtrip(m, n, k, j, rank):
    M = jax.random.normal(jax.random.PRNGKey(2), (m, n))
    w1, w2 = blockdiag_butterfly_project_einsum_rank(M, k, j, rank)
    assert w1.shape == (k, rank * j, n // k)
    assert w2.shape == (j, m // j, k * rank)
    x = jax.random.normal(jax.random.PRNGKey(3), (5, n))
    got = blockdiag_butterfly_multiply(x, w1, w2)
    oracle = blockdiag_butterfly_multiply_einsum_rank(x, w1, w2)
    # fast multiply and einsum oracle agree on projected layouts
    np.testing.assert_allclose(np.asarray(got), np.asarray(oracle), rtol=1e-4, atol=1e-4)
    full_rank = min(m // j, n // k)
    if rank >= full_rank:
        # exact reconstruction: monarch(x) == x @ M^T
        np.testing.assert_allclose(np.asarray(got), np.asarray(x @ M.T), rtol=1e-3, atol=1e-3)
    else:
        # truncated SVD is the best approx; dense equivalent must match the
        # blockwise-truncated matrix
        dense = monarch_dense_equivalent(w1, w2)
        assert dense.shape == M.shape


def test_projection_reverse_sums_to_exact():
    M = jax.random.normal(jax.random.PRNGKey(4), (16, 16))
    w1, w2, w1r, w2r = blockdiag_butterfly_project_einsum_rank(M, 4, 4, 2, reverse=True)
    d = monarch_dense_equivalent(w1, w2) + monarch_dense_equivalent(w1r, w2r)
    np.testing.assert_allclose(np.asarray(d), np.asarray(M), rtol=1e-3, atol=1e-3)


def test_square_project_exact_full_blocks():
    n = 16
    M = jax.random.normal(jax.random.PRNGKey(5), (n, n))
    w1, w2 = blockdiag_butterfly_project(M, sizes=(4, 4))
    # rank-1 truncation of random blocks is lossy; just check shapes/run
    assert w1.shape == (4, 4, 4) and w2.shape == (4, 4, 4)


@pytest.mark.parametrize("n", [16, 64, 36])
@pytest.mark.parametrize("direction", ["fft", "ifft"])
def test_fft_as_monarch(n, direction):
    perm, w1, w2 = butterfly_fft_factors(n, direction=direction, norm="ortho")
    x = (jax.random.normal(jax.random.PRNGKey(6), (4, n))
         + 1j * jax.random.normal(jax.random.PRNGKey(7), (4, n))).astype(jnp.complex64)
    got = blockdiag_butterfly_multiply(x[..., perm], w1, w2)
    fn = jnp.fft.fft if direction == "fft" else jnp.fft.ifft
    expected = fn(x, norm="ortho")
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), rtol=1e-3, atol=1e-3)


def test_factors():
    assert factors(16)[-1] == (4, 4)
    assert factors(36)[-1] == (6, 6)
    assert factors(12)[-1] == (3, 4)
