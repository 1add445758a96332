"""BlockdiagLinear and ButterflyFFT layers."""

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from sparse_matrix_fine_tuning_tpu.layers.structured import (
    BlockdiagLinear,
    ButterflyFFT,
    ButterflyFFT2,
)


def test_blockdiag_linear_shapes_and_sparsity():
    layer = BlockdiagLinear(32, 48, nblocks=4, rngs=nnx.Rngs(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (5, 32))
    out = layer(x)
    assert out.shape == (5, 48)
    assert layer.weight[...].size == 4 * 12 * 8  # vs 32*48 dense


def test_blockdiag_linear_shuffle_runs():
    layer = BlockdiagLinear(32, 32, nblocks=4, shuffle=True, rngs=nnx.Rngs(0))
    x = jax.random.normal(jax.random.PRNGKey(2), (3, 32))
    assert layer(x).shape == (3, 32)


def test_butterfly_fft_exact_at_init():
    n = 64
    fft = ButterflyFFT(n, rngs=nnx.Rngs(0))
    x = (jax.random.normal(jax.random.PRNGKey(3), (4, n))
         + 1j * jax.random.normal(jax.random.PRNGKey(4), (4, n))).astype(jnp.complex64)
    got = fft(x)
    expected = jnp.fft.fft(x, norm="ortho")
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=1e-3, atol=1e-3)


def test_butterfly_fft2():
    fft2 = ButterflyFFT2(16, 16, rngs=nnx.Rngs(0))
    x = jax.random.normal(jax.random.PRNGKey(5), (2, 16, 16)).astype(jnp.complex64)
    got = fft2(x)
    expected = jnp.fft.fft2(x, norm="ortho")
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=1e-3, atol=1e-3)


def test_butterfly_ifft():
    n = 36  # non power of two
    ifft = ButterflyFFT(n, direction="ifft", rngs=nnx.Rngs(0))
    x = jax.random.normal(jax.random.PRNGKey(6), (2, n)).astype(jnp.complex64)
    np.testing.assert_allclose(np.asarray(ifft(x)),
                               np.asarray(jnp.fft.ifft(x, norm="ortho")),
                               rtol=1e-3, atol=1e-3)
