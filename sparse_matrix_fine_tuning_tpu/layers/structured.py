"""Additional structured linear layers: BlockdiagLinear and ButterflyFFT.

Completes the reference's layer inventory (src/layers/blockdiag_linear.py:11-70
and src/ops/blockdiag_butterfly_projection.py:52-87).  BlockSparseLinear and
SpectralConv1d/2d are vestigial in the reference (broken imports / dead code
inherited from HazyResearch/fly -- SURVEY.md section 2.2) but have WORKING
TPU-native equivalents here: layers/blocksparse.py and layers/spectral.py.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import nnx

from sparse_matrix_fine_tuning_tpu.layers.monarch_linear import AdapterParam
from sparse_matrix_fine_tuning_tpu.ops.blockdiag import blockdiag_multiply
from sparse_matrix_fine_tuning_tpu.ops.monarch import blockdiag_butterfly_multiply
from sparse_matrix_fine_tuning_tpu.ops.projection import butterfly_fft_factors

Array = jax.Array


class BlockdiagLinear(nnx.Module):
    """Block-diagonal linear with optional ShuffleNet-style channel shuffle
    (reference src/layers/blockdiag_linear.py:11-47)."""

    def __init__(self, in_features: int, out_features: int, *,
                 nblocks: int = 4, shuffle: bool = False,
                 use_bias: bool = True, param_dtype=jnp.float32,
                 rngs: nnx.Rngs):
        assert in_features % nblocks == 0 and out_features % nblocks == 0
        self.in_features = in_features
        self.out_features = out_features
        self.nblocks = nblocks
        self.shuffle = shuffle
        in_blk = in_features // nblocks
        out_blk = out_features // nblocks
        # dense-equivalent Kaiming scaling: std matches a dense (out, in)
        # layer so stacking stays variance-stable despite the sparsity
        bound = 1.0 / math.sqrt(in_features)
        key, kb = jax.random.split(rngs.params())
        self.weight = AdapterParam(jax.random.uniform(
            key, (nblocks, out_blk, in_blk), param_dtype, -bound, bound))
        self.bias = AdapterParam(jnp.zeros((out_features,), param_dtype)) \
            if use_bias else None

    def __call__(self, x: Array) -> Array:
        if self.shuffle:
            # channel shuffle: (k, c) view transposed -> (c, k)
            b = x.shape[:-1]
            x = x.reshape(*b, self.nblocks, -1).swapaxes(-1, -2).reshape(*b, -1)
        out = blockdiag_multiply(x, self.weight[...].astype(x.dtype))
        if self.bias is not None:
            out = out + self.bias[...].astype(out.dtype)
        return out


class ButterflyFFT(nnx.Module):
    """Length-n (i)DFT parameterised as input-permutation + Monarch product,
    trainable as real tensors (reference
    src/ops/blockdiag_butterfly_projection.py:52-74).  Exact at init."""

    def __init__(self, n: int, direction: str = "fft", norm: str = "ortho",
                 *, rngs: Optional[nnx.Rngs] = None):
        perm, w1, w2 = butterfly_fft_factors(n, direction=direction, norm=norm)
        self.n = n
        self.perm = nnx.Variable(perm)
        # store complex factors as stacked real/imag (Adam-friendly,
        # reference stores torch.view_as_real)
        self.w1 = AdapterParam(jnp.stack([w1.real, w1.imag], -1))
        self.w2 = AdapterParam(jnp.stack([w2.real, w2.imag], -1))

    def _complex(self, p: Array) -> Array:
        return jax.lax.complex(p[..., 0], p[..., 1])

    def __call__(self, x: Array) -> Array:
        xc = x.astype(jnp.complex64) if not jnp.issubdtype(x.dtype, jnp.complexfloating) else x
        shaped = xc[..., self.perm[...]].reshape(-1, self.n)
        out = blockdiag_butterfly_multiply(
            shaped, self._complex(self.w1[...]), self._complex(self.w2[...]))
        return out.reshape(xc.shape)


class ButterflyFFT2(nnx.Module):
    """2-D FFT as two composed ButterflyFFTs (reference :77-87)."""

    def __init__(self, n1: int, n2: int, direction: str = "fft",
                 norm: str = "ortho", *, rngs: Optional[nnx.Rngs] = None):
        self.fft1 = ButterflyFFT(n1, direction, norm, rngs=rngs)
        self.fft2 = ButterflyFFT(n2, direction, norm, rngs=rngs)

    def __call__(self, x: Array) -> Array:
        out = jnp.swapaxes(self.fft1(jnp.swapaxes(x, -1, -2)), -1, -2)
        return self.fft2(out)
