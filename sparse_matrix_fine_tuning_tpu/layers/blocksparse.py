"""Block-sparse linear with butterfly sparsity layouts.

The reference's ``BlockSparseLinear`` (src/layers/blocksparse_linear.py:34-
207) cannot run at all: it imports ``src.utils.utils``,
``src.models.attention.blocksparse_utils`` and ``hydra``, none of which
exist in its repo (SURVEY.md section 2.2 -- inherited from
HazyResearch/fly).  This is a WORKING TPU-native equivalent of the
capability it describes: a linear layer whose weight is stored as the
``nnz`` active (block_size x block_size) blocks of a block-level sparsity
layout, with the flat-block-butterfly layout generator
(``FlatBlockButterflySparsityConfig``, reference blocksparse_linear.py:
172-207) and the reference's dense-init-then-sparsify initialisation with
its sqrt(ncols/nnz_cols) per-row-block variance correction.

TPU execution model: the active blocks are scattered into the dense
(out_ext, in_ext) operand with STATIC indices (a handful of
dynamic-update-slices under jit, fused by XLA) and the matmul runs dense
on the MXU.  That is deliberate -- at butterfly sparsity (2 nonzero block
-columns per block-row) the MXU's preference for large dense tiles beats
gather-style block matmuls, and the materialisation cost is one weight
-sized write, same order as reading the weight at all.  The reference's
own only importable backend ("dense", blocksparse_linear.py:160-163) makes
the same call.  For real structured-sparsity FLOP savings on TPU, prefer
``MonarchLinear``/``BlockdiagLinear`` -- products of block-diagonals ARE
the TPU-shaped butterfly.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from sparse_matrix_fine_tuning_tpu.ops.butterfly import (
    butterfly_factor_to_matrix,
)

Array = jax.Array


class FlatBlockButterflySparsityConfig:
    """Block-level butterfly support mask (reference blocksparse_linear.py:
    172-207): the union of the first ``n_factors`` classic butterfly
    factors' supports, tiled up to the feature sizes, optional ShuffleNet
    column shuffle and dense global rows/columns."""

    def __init__(self, butterfly_size: int, n_factors: int, block: int = 32,
                 global_size: int = 0, shuffle: bool = False):
        log_n = int(math.log2(butterfly_size))
        if butterfly_size != 2 ** log_n or butterfly_size < 2:
            raise NotImplementedError("butterfly_size must be a power of 2")
        if not 1 <= n_factors <= log_n:
            raise NotImplementedError(
                "n_factors must be between 1 and log2(butterfly_size)")
        self.block = block
        self.butterfly_size = butterfly_size
        self.n_factors = n_factors
        self.global_size = global_size
        self.shuffle = shuffle

    def make_layout(self, out_features: int, in_features: int) -> np.ndarray:
        """(out_features // block, in_features // block) 0/1 int array."""
        assert out_features % self.block == 0 and \
            in_features % self.block == 0
        bs = self.butterfly_size
        twiddle = jnp.ones((bs // 2, 2, 2), jnp.float32)
        support = sum(np.asarray(butterfly_factor_to_matrix(twiddle, i))
                      for i in range(self.n_factors))
        layout = (support > 0).astype(np.int64)  # (bs, bs)
        if self.shuffle:
            log_n = int(math.log2(bs))
            ngroups = 2 ** (log_n - self.n_factors)
            # (m, group * c_per_group) -> (m, c_per_group * group)
            layout = layout.reshape(bs, ngroups, bs // ngroups) \
                .transpose(0, 2, 1).reshape(bs, bs)
        f, f1 = out_features // bs, in_features // bs
        layout = np.repeat(np.repeat(layout, f, axis=0), f1, axis=1)
        if self.global_size > 0:
            layout[: self.global_size] = 1
            layout[:, : self.global_size] = 1
        p, r = out_features // self.block, in_features // self.block
        layout = layout.reshape(p, self.block, r, self.block)
        return (layout.sum(axis=(1, 3)) > 0).astype(np.int64)


class BlockSparseLinear(nnx.Module):
    """y = x @ W^T + b where W's support is a block-level layout and only
    the ``nnz`` active blocks are stored/trained.

    Args:
      sparsity_config: a config object with ``.block`` and
        ``.make_layout(out_ext, in_ext)``, or an explicit 0/1 layout array
        of shape (out_ext // block_size, in_ext // block_size) together
        with ``block_size``.
    """

    def __init__(self, in_features: int, out_features: int,
                 sparsity_config=None, *, layout: Optional[np.ndarray] = None,
                 block_size: Optional[int] = None, bias: bool = True,
                 param_dtype=jnp.float32, rngs: nnx.Rngs):
        self.in_features = in_features
        self.out_features = out_features
        if sparsity_config is not None:
            block_size = sparsity_config.block
        assert block_size is not None, "need sparsity_config or block_size"
        self.block_size = block_size
        self.in_features_extended = -(-in_features // block_size) * block_size
        self.out_features_extended = -(-out_features // block_size) * block_size
        if sparsity_config is not None:
            layout = sparsity_config.make_layout(
                self.out_features_extended, self.in_features_extended)
        layout = np.asarray(layout, np.int64)
        assert layout.shape == (self.out_features_extended // block_size,
                                self.in_features_extended // block_size)
        self.layout = layout  # static python state: bakes into the jit
        ob, ib = np.nonzero(layout)  # active (out_blk, in_blk), row-major
        self._flat_idx = jnp.asarray(ob * layout.shape[1] + ib)
        self.nnz_blocks = int(len(ob))

        # reference init semantics (blocksparse_linear.py:85-107): kaiming
        # -uniform over the EXTENDED dense, scaled per block-row by
        # sqrt(ncols / nnz_cols) to restore the effective fan-in variance,
        # then sparsified to the active blocks
        key = rngs.params()
        fan_in = self.in_features_extended
        bound = math.sqrt(3.0) * math.sqrt(2.0 / (1 + 5)) / math.sqrt(fan_in)
        dense = jax.random.uniform(
            key, (self.out_features_extended, self.in_features_extended),
            jnp.float32, -bound, bound)
        scaling = np.sqrt(layout.shape[1] / layout.sum(axis=1))  # (p,)
        dense = dense * jnp.repeat(jnp.asarray(scaling, jnp.float32),
                                   block_size)[:, None]
        blocks = dense.reshape(layout.shape[0], block_size,
                               layout.shape[1], block_size)
        blocks = blocks.transpose(0, 2, 1, 3)[ob, ib]  # (nnz, bs, bs)
        self.weight = nnx.Param(blocks.astype(param_dtype))
        if bias:
            b_bound = 1 / math.sqrt(fan_in)
            self.bias = nnx.Param(jax.random.uniform(
                rngs.params(), (out_features,), jnp.float32,
                -b_bound, b_bound).astype(param_dtype))
        else:
            self.bias = None

    @property
    def saving(self) -> float:
        return (self.nnz_blocks * self.block_size ** 2
                / (self.in_features * self.out_features))

    def dense_weight(self) -> Array:
        """Materialise (out_ext, in_ext) -- static-index scatter, fused
        into the matmul's operand build under jit."""
        p, r = self.layout.shape
        bsz = self.block_size
        flat = jnp.zeros((p * r, bsz, bsz), self.weight[...].dtype)
        flat = flat.at[self._flat_idx].set(self.weight[...])
        return flat.reshape(p, r, bsz, bsz).transpose(0, 2, 1, 3) \
            .reshape(p * bsz, r * bsz)

    def __call__(self, x: Array) -> Array:
        pad = self.in_features_extended - x.shape[-1]
        if pad:
            x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
        w = self.dense_weight().astype(x.dtype)
        out = jax.lax.dot_general(
            x, w, (((x.ndim - 1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32).astype(x.dtype)
        out = out[..., : self.out_features]
        if self.bias is not None:
            out = out + self.bias[...].astype(out.dtype)
        return out
