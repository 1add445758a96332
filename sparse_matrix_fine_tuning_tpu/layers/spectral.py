"""FNO spectral convolutions: FFT -> per-mode linear mix -> inverse FFT.

The reference ships these as dead code (src/layers/spectral_conv.py:23-109
imports cleanly but nothing uses it, and its sibling block-sparse module is
broken -- SURVEY.md section 2.2); these are WORKING TPU-native equivalents
so the capability actually exists here.  Semantics follow the reference:
ortho-normalised rfft, complex weights stored as a trailing-2 REAL Param
(same storage trick, for the same reason -- Adam moments on complex dtypes
are ill-defined), truncation to the lowest `modes` frequencies (1d) or the
low/high corner bands (2d), zero-padding the rest, irfft back to the input
length.

TPU notes: the mode mix is an einsum over tiny mode tensors -- XLA maps it
to MXU batched matmuls; FFTs lower to XLA's native fft. Everything is
static-shaped and jit-safe.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import nnx

Array = jax.Array


def _complex(w: Array) -> Array:
    return jax.lax.complex(w[..., 0], w[..., 1])


class SpectralConv1d(nnx.Module):
    """1D Fourier layer (reference src/layers/spectral_conv.py:23-62).

    x: (batch, in_channels, length) -> (batch, out_channels, length).
    """

    def __init__(self, in_channels: int, out_channels: int, modes1: int,
                 *, rngs: nnx.Rngs):
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.modes1 = modes1
        scale = 1.0 / (in_channels * out_channels)
        self.weights1 = nnx.Param(scale * jax.random.normal(
            rngs.params(), (in_channels, out_channels, modes1, 2),
            jnp.float32))

    def __call__(self, x: Array) -> Array:
        n = x.shape[-1]
        x_ft = jnp.fft.rfft(x.astype(jnp.float32), norm="ortho")
        w = _complex(self.weights1[...])
        out_lo = jnp.einsum("bix,iox->box", x_ft[:, :, :self.modes1], w)
        out_ft = jnp.pad(
            out_lo, ((0, 0), (0, 0), (0, x_ft.shape[-1] - self.modes1)))
        return jnp.fft.irfft(out_ft, n=n, norm="ortho").astype(x.dtype)


class SpectralConv2d(nnx.Module):
    """2D Fourier layer (reference src/layers/spectral_conv.py:66-109).

    x: (batch, in_channels, h, w) -> (batch, out_channels, h, w).  Two
    weight tensors mix the (low, low) and (high, low) frequency corners of
    the rfft2 spectrum, matching the reference's two-band layout.
    """

    def __init__(self, in_channels: int, out_channels: int, modes1: int,
                 modes2: int, *, rngs: nnx.Rngs):
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.modes1 = modes1
        self.modes2 = modes2
        scale = 1.0 / (in_channels * out_channels)
        shape = (in_channels, out_channels, modes1, modes2, 2)
        self.weights1 = nnx.Param(scale * jax.random.normal(
            rngs.params(), shape, jnp.float32))
        self.weights2 = nnx.Param(scale * jax.random.normal(
            rngs.params(), shape, jnp.float32))

    def __call__(self, x: Array) -> Array:
        h, w_len = x.shape[-2], x.shape[-1]
        x_ft = jnp.fft.rfft2(x.astype(jnp.float32), norm="ortho")
        m1, m2 = self.modes1, self.modes2
        w1 = _complex(self.weights1[...])
        w2 = _complex(self.weights2[...])
        lo = jnp.einsum("bixy,ioxy->boxy", x_ft[:, :, :m1, :m2], w1)
        hi = jnp.einsum("bixy,ioxy->boxy", x_ft[:, :, -m1:, :m2], w2)
        out_ft = jnp.zeros(
            (x.shape[0], self.out_channels) + x_ft.shape[-2:], x_ft.dtype)
        out_ft = out_ft.at[:, :, :m1, :m2].set(lo)
        out_ft = out_ft.at[:, :, -m1:, :m2].set(hi)
        return jnp.fft.irfft2(out_ft, s=(h, w_len),
                              norm="ortho").astype(x.dtype)
