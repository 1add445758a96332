"""MonarchLinear / MonarchFactor / Scaler behaviour.

Covers: adapter identity-at-init, dense+adapter additivity, SVD projection
mode, svd_init residual exactness, merge/unmerge round-trip, padding for
non-divisible features, scaler gating, saving ratio, trainable-param
filtering by variable type.
"""

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from sparse_matrix_fine_tuning_tpu.layers import (
    AdapterParam,
    MonarchFactor,
    MonarchLinear,
    Scaler,
)
from sparse_matrix_fine_tuning_tpu.ops.monarch import blockdiag_butterfly_multiply


def _layer(in_f=32, out_f=48, seed=0, **kw):
    w = jax.random.normal(jax.random.PRNGKey(seed), (out_f, in_f)) * 0.1
    return MonarchLinear(in_f, out_f, weights=w, rngs=nnx.Rngs(seed), **kw), w


def test_adapter_is_identity_at_init():
    # blkdiag2 zero-init => layer output == dense output at init
    layer, w = _layer()
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 32))
    np.testing.assert_allclose(np.asarray(layer(x)), np.asarray(x @ w.T), rtol=1e-5, atol=1e-5)
    assert float(jnp.abs(layer.blkdiag2[...]).max()) == 0.0
    assert float(jnp.abs(layer.blkdiag1[...]).max()) > 0.0


def test_adapter_additivity():
    layer, w = _layer()
    layer.blkdiag2.set_value(jax.random.normal(
        jax.random.PRNGKey(2), layer.blkdiag2[...].shape) * 0.1)
    x = jax.random.normal(jax.random.PRNGKey(3), (4, 32))
    expected = x @ w.T + layer.monarch_forward(x)
    np.testing.assert_allclose(np.asarray(layer(x)), np.asarray(expected), rtol=1e-5, atol=1e-5)


def test_projection_mode_full_rank_exact():
    in_f = out_f = 32
    w = jax.random.normal(jax.random.PRNGKey(4), (out_f, in_f))
    layer = MonarchLinear(
        in_f, out_f, weights=w, as_adapter=False, project_rank=8,
        rngs=nnx.Rngs(0), peft_config={"nblocks": 4, "blk_r": 4})
    x = jax.random.normal(jax.random.PRNGKey(5), (6, in_f))
    # full rank (min(l,i) = 8) => exact reconstruction of x @ w^T
    np.testing.assert_allclose(np.asarray(layer(x)), np.asarray(x @ w.T), rtol=1e-3, atol=1e-3)
    assert layer.dense is None


def test_svd_init_residual_exact():
    in_f = out_f = 32
    w = jax.random.normal(jax.random.PRNGKey(6), (out_f, in_f))
    layer = MonarchLinear(
        in_f, out_f, weights=w, project_rank=2,
        peft_config={"nblocks": 4, "blk_r": 4, "svd_init": True}, rngs=nnx.Rngs(0))
    x = jax.random.normal(jax.random.PRNGKey(7), (6, in_f))
    # dense residual + monarch approx == original map, exactly, at init
    np.testing.assert_allclose(np.asarray(layer(x)), np.asarray(x @ w.T), rtol=1e-3, atol=1e-3)


def test_merge_unmerge_roundtrip():
    layer, w = _layer()
    layer.blkdiag2.set_value(jax.random.normal(
        jax.random.PRNGKey(8), layer.blkdiag2[...].shape) * 0.1)
    x = jax.random.normal(jax.random.PRNGKey(9), (4, 32))
    before = np.asarray(layer(x))
    layer.merge_adapter()
    assert layer.merged
    merged_out = np.asarray(layer(x))
    np.testing.assert_allclose(merged_out, before, rtol=1e-4, atol=1e-4)
    layer.unmerge_adapter()
    np.testing.assert_allclose(np.asarray(layer(x)), before, rtol=1e-4, atol=1e-4)


def test_padding_non_divisible():
    # 30 -> 50 with nblocks=4: in_blksz=8, pad to 32; out gets truncated
    layer, w = _layer(in_f=30, out_f=50)
    x = jax.random.normal(jax.random.PRNGKey(10), (4, 30))
    out = layer(x)
    assert out.shape == (4, 50)
    layer.blkdiag2.set_value(jax.random.normal(
        jax.random.PRNGKey(11), layer.blkdiag2[...].shape) * 0.1)
    assert layer(x).shape == (4, 50)


def test_scaler_gates_adapter():
    w = jax.random.normal(jax.random.PRNGKey(12), (32, 32)) * 0.1
    layer = MonarchLinear(
        32, 32, weights=w, rngs=nnx.Rngs(0),
        peft_config={"nblocks": 4, "blk_r": 4, "scaler": True})
    # with scaler: BOTH factors random but scaler=0 gates the branch
    assert float(jnp.abs(layer.blkdiag2[...]).max()) > 0
    x = jax.random.normal(jax.random.PRNGKey(13), (4, 32))
    np.testing.assert_allclose(np.asarray(layer(x)), np.asarray(x @ w.T), rtol=1e-5, atol=1e-5)


def test_saving_ratio():
    layer, _ = _layer(in_f=64, out_f=64)
    expected = (layer.blkdiag1[...].size + layer.blkdiag2[...].size) / (64 * 64)
    assert abs(layer.saving - expected) < 1e-9
    assert layer.saving < 1.0


def test_trainable_filtering_by_type():
    layer, _ = _layer()
    adapter_state = nnx.state(layer, AdapterParam)
    flat = list(adapter_state.flat_state())
    names = {"/".join(str(p) for p in path) for path, _ in flat}
    assert any("blkdiag1" in n for n in names)
    assert any("blkdiag2" in n for n in names)
    assert not any("dense" in n for n in names)


def test_monarch_factor():
    f = MonarchFactor(32, 16, nblocks=4, blk_r=4, rngs=nnx.Rngs(0))
    x = jax.random.normal(jax.random.PRNGKey(14), (4, 32))
    assert f(x).shape == (4, 16)
    f_ortho = MonarchFactor(32, 32, nblocks=4, blk_r=8, ortho=True, rngs=nnx.Rngs(0))
    for blk in f_ortho.weight[...]:
        gram = blk @ blk.T
        np.testing.assert_allclose(np.asarray(gram), np.eye(8), atol=1e-4)


def test_kaiming_init_bounds():
    layer, _ = _layer(in_f=64, out_f=64, seed=3)
    bound = 1.0 / np.sqrt(layer.in_blksz)
    bd1 = np.asarray(layer.blkdiag1[...])
    assert bd1.max() <= bound and bd1.min() >= -bound
    assert bd1.std() > 0.3 * bound  # roughly uniform, not degenerate


def test_merge_refuses_quantized_base():
    """Merging a float adapter delta into packed int codes would silently
    corrupt the weights; the layer must refuse with a clear error."""
    import pytest
    from sparse_matrix_fine_tuning_tpu.quant import quantize_frozen_base

    layer, _ = _layer(in_f=64, out_f=64, seed=5)
    layer.blkdiag2.set_value(jax.random.normal(
        jax.random.PRNGKey(6), layer.blkdiag2[...].shape) * 0.1)

    class Holder(nnx.Module):
        def __init__(self, l):
            self.l = l

    quantize_frozen_base(Holder(layer), bits=8)
    assert layer.quant_bits == 8
    with pytest.raises(ValueError, match="quantized base"):
        layer.merge_adapter()


def test_merge_preserves_bf16_base_dtype():
    """Merging must cast the delta to the dense's own dtype -- a bf16 base
    silently promoting to f32 would double the frozen base's HBM."""
    w = (jax.random.normal(jax.random.PRNGKey(7), (64, 64)) * 0.1
         ).astype(jnp.bfloat16)
    layer = MonarchLinear(64, 64, weights=w, rngs=nnx.Rngs(0))
    layer.blkdiag2.set_value(jax.random.normal(
        jax.random.PRNGKey(8), layer.blkdiag2[...].shape) * 0.1)
    layer.merge_adapter()
    assert layer.dense[...].dtype == jnp.bfloat16
    layer.unmerge_adapter()
    assert layer.dense[...].dtype == jnp.bfloat16


def test_use_mult_factor_rejects_non_square():
    """M_mult applies to the dense output, which only closes for square
    unpadded layers -- the constructor must say so, not crash in forward."""
    import pytest
    with pytest.raises(ValueError, match="use_mult_factor"):
        _layer(in_f=32, out_f=64, peft_config={"use_mult_factor": True})
    # square still constructs and runs
    layer, w = _layer(in_f=32, out_f=32,
                      peft_config={"use_mult_factor": True})
    x = jax.random.normal(jax.random.PRNGKey(9), (4, 32))
    assert layer(x).shape == (4, 32)
