"""BlockSparseLinear + FlatBlockButterflySparsityConfig.

No reference-in-the-loop oracle exists: the reference's module imports
modules missing from its own repo (blocksparse_linear.py:11-22 -- verified
unimportable), so the oracles here are the math itself: the butterfly
layout against a hand-computed support, the forward against an explicit
masked-dense matmul, and gradient support confinement.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from sparse_matrix_fine_tuning_tpu.layers.blocksparse import (
    BlockSparseLinear,
    FlatBlockButterflySparsityConfig,
)


def test_butterfly_layout_support():
    # butterfly_size 4, 1 factor, block 2 over 8x8 features: factor 0 mixes
    # index pairs (0,1) and (2,3) -> block-level support is the two 2x2
    # diagonal superblocks once tiled by f=f1=2
    cfg = FlatBlockButterflySparsityConfig(butterfly_size=4, n_factors=1,
                                           block=2)
    layout = cfg.make_layout(8, 8)
    assert layout.shape == (4, 4)
    expect = np.zeros((4, 4), np.int64)
    expect[:2, :2] = 1
    expect[2:, 2:] = 1
    np.testing.assert_array_equal(layout, expect)
    # the layout is the UNION of factor supports (flat butterfly), not the
    # product: with both factors of n=4, each row sees itself + one partner
    # per factor = 3 of 4 block-columns
    full = FlatBlockButterflySparsityConfig(4, 2, block=2).make_layout(8, 8)
    assert (full.sum(axis=1) == 3).all() and full.min() == 0


def test_global_size_densifies_edges():
    cfg = FlatBlockButterflySparsityConfig(4, 1, block=2, global_size=2)
    layout = cfg.make_layout(8, 8)
    assert layout[0].min() == 1 and layout[:, 0].min() == 1


def test_forward_equals_masked_dense():
    cfg = FlatBlockButterflySparsityConfig(butterfly_size=4, n_factors=1,
                                           block=4)
    layer = BlockSparseLinear(16, 16, cfg, rngs=nnx.Rngs(0))
    w = np.asarray(layer.dense_weight())
    # support confined to the layout
    mask = np.kron(layer.layout, np.ones((4, 4)))
    assert np.all(w[mask == 0] == 0)
    x = np.random.default_rng(0).normal(size=(3, 16)).astype(np.float32)
    out = np.asarray(layer(jnp.asarray(x)))
    expect = x @ w.T + np.asarray(layer.bias[...])
    np.testing.assert_allclose(out, expect, rtol=1e-5, atol=1e-5)
    assert layer.saving == layer.nnz_blocks * 16 / 256


def test_pad_and_truncate_non_multiple_features():
    layout = np.ones((2, 2), np.int64)
    layer = BlockSparseLinear(5, 6, layout=layout, block_size=4,
                              rngs=nnx.Rngs(1))
    x = jnp.asarray(np.random.default_rng(1).normal(size=(2, 5)),
                    jnp.float32)
    out = layer(x)
    assert out.shape == (2, 6)
    w = np.asarray(layer.dense_weight())[:6, :5]
    expect = np.asarray(x) @ w.T + np.asarray(layer.bias[...])
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-5, atol=1e-5)


def test_grads_confined_to_active_blocks_and_jit():
    cfg = FlatBlockButterflySparsityConfig(butterfly_size=8, n_factors=2,
                                           block=2)
    layer = BlockSparseLinear(16, 16, cfg, bias=False, rngs=nnx.Rngs(2))
    x = jnp.asarray(np.random.default_rng(2).normal(size=(4, 16)),
                    jnp.float32)

    @nnx.jit
    def step(model, x):
        return nnx.value_and_grad(
            lambda m, x: jnp.sum(m(x) ** 2))(model, x)

    val, grads = step(layer, x)
    g = np.asarray(grads["weight"].value)
    assert g.shape == (layer.nnz_blocks, 2, 2)
    assert np.isfinite(float(val)) and np.abs(g).sum() > 0


def test_init_variance_correction():
    # per-row variance of the sparsified weight should track the DENSE
    # kaiming variance (that is what the sqrt(ncol/nnz) scaling is for)
    cfg = FlatBlockButterflySparsityConfig(butterfly_size=8, n_factors=1,
                                           block=8)
    layer = BlockSparseLinear(64, 64, cfg, rngs=nnx.Rngs(3))
    w = np.asarray(layer.dense_weight())
    nnz_var = w[w != 0].var()
    dense_bound = 1 / math.sqrt(64)
    dense_var = dense_bound ** 2 / 3
    # scaled by ncol/nnz = 8/2 = 4
    assert abs(nnz_var / (4 * dense_var) - 1) < 0.15
