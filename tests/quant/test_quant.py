"""Quantized frozen base: round-trip accuracy and end-to-end training."""

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from sparse_matrix_fine_tuning_tpu.layers import MonarchLinear
from sparse_matrix_fine_tuning_tpu.models import LlamaConfig, LlamaForCausalLM
from sparse_matrix_fine_tuning_tpu.peft import init_monarch
from sparse_matrix_fine_tuning_tpu.quant import (
    dequantize_int4,
    dequantize_int8,
    quantize_frozen_base,
    quantize_int4,
    quantize_int8,
)
from sparse_matrix_fine_tuning_tpu.utils.testing import fresh_model


def test_int8_roundtrip():
    w = np.random.default_rng(0).normal(size=(16, 64)).astype(np.float32)
    q, s = quantize_int8(w)
    wq = np.asarray(dequantize_int8(jnp.asarray(q), jnp.asarray(s)))
    err = np.abs(wq - w).max() / np.abs(w).max()
    assert err < 0.01  # ~1/127


def test_int4_roundtrip():
    w = np.random.default_rng(1).normal(size=(16, 128)).astype(np.float32)
    q, s = quantize_int4(w, group_size=64)
    # in-major layout: packed_t (in/2, out), scales (in/group, out)
    assert q.shape == (64, 16) and q.dtype == np.uint8
    assert s.shape == (2, 16)
    wq = np.asarray(dequantize_int4(jnp.asarray(q), jnp.asarray(s), 64))
    assert wq.shape == w.shape
    err = np.abs(wq - w).max() / np.abs(w).max()
    assert err < 0.1  # ~1/7 worst case per group


def test_quantized_layer_forward_close():
    w = jax.random.normal(jax.random.PRNGKey(0), (64, 64)) * 0.1
    layer = MonarchLinear(64, 64, weights=w, rngs=nnx.Rngs(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 64))
    ref = np.asarray(layer(x))
    n = quantize_frozen_base(layer, bits=8)
    assert n == 1, "bare-layer root must quantize (was vacuously 0)"
    out8 = np.asarray(layer(x))
    diff = np.abs(out8 - ref).max()
    assert 0 < diff < 0.02 * np.abs(ref).max() + 0.01


def test_quantized_layer_int4_odd_infeatures():
    """in_features whose half is not a multiple of 64 still quantizes via
    the per-layer group fallback (e.g. 8640 -> group 60; the 3.3B
    down_proj shape that a stricter check silently skipped)."""
    from sparse_matrix_fine_tuning_tpu.quant import _fit_group
    assert _fit_group(8640, 64) == 60
    w = jax.random.normal(jax.random.PRNGKey(0), (32, 480)) * 0.1
    layer = MonarchLinear(480, 32, weights=w, rngs=nnx.Rngs(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 480))
    ref = np.asarray(layer(x))
    n = quantize_frozen_base(layer, bits=4, group_size=64)
    assert n == 1 and layer.quant_group == 60  # 240 % 64 != 0, 240 % 60 == 0
    out4 = np.asarray(layer(x))
    diff = np.abs(out4 - ref).max()
    assert 0 < diff < 0.1 * np.abs(ref).max() + 0.02


def test_quantized_model_trains():
    cfg = LlamaConfig.tiny()
    model = fresh_model(LlamaForCausalLM, cfg)
    init_monarch(model, {"monarch": True, "nblocks": 4, "blk_r": 4,
                         "adapter": True,
                         "target_modules": ["q_proj", "v_proj", "up_proj"]},
                 rngs=nnx.Rngs(1))
    n = quantize_frozen_base(model, bits=4, group_size=16)
    assert n > 0
    ids = jax.random.randint(jax.random.PRNGKey(2), (2, 8), 0, cfg.vocab_size)

    from sparse_matrix_fine_tuning_tpu.peft import trainable_filter
    filt = trainable_filter()

    @nnx.jit
    def step(model, ids):
        def loss(m, ids):
            return m.loss(m(ids), ids)
        val, grads = nnx.value_and_grad(loss, argnums=nnx.DiffState(0, filt))(model, ids)
        return val, grads

    val, grads = step(model, ids)
    assert np.isfinite(float(val))
    gnorm = sum(float(jnp.abs(g).sum()) for g in jax.tree.leaves(grads))
    assert gnorm > 0


def test_int8_lm_head_logits_close_and_tied_refused():
    from sparse_matrix_fine_tuning_tpu.quant import Int8LMHead, quantize_lm_head

    cfg = LlamaConfig.tiny()
    model = fresh_model(LlamaForCausalLM, cfg)
    ids = jax.random.randint(jax.random.PRNGKey(0), (2, 8), 2, cfg.vocab_size)
    ref = model(ids)
    assert quantize_lm_head(model)
    assert isinstance(model.lm_head, Int8LMHead)
    out = model(ids)
    err = float(jnp.abs(out - ref).max() / (jnp.abs(ref).max() + 1e-9))
    assert err < 0.02  # per-column absmax int8: ~1/127 worst case
    # w8a8: one more error term (activation quant), still close
    model8 = fresh_model(LlamaForCausalLM, cfg)
    assert quantize_lm_head(model8, impl="w8a8")
    out8 = model8(ids)
    err8 = float(jnp.abs(out8 - ref).max() / (jnp.abs(ref).max() + 1e-9))
    assert err8 < 0.04
    # tied embeddings reuse the embedding matrix for logits: refuse
    tied = fresh_model(LlamaForCausalLM, LlamaConfig.tiny(tie_word_embeddings=True))
    assert not quantize_lm_head(tied)


def test_int8_lm_head_fused_kernel_matches_xla_dequant():
    """The Pallas dequant-dot and the XLA dequantize-then-dot paths of
    Int8LMHead must agree bit-for-bit modulo accumulation order (both
    accumulate f32); interpret=True exercises the kernel on CPU."""
    from sparse_matrix_fine_tuning_tpu.kernels.quant_matmul import int8_matmul
    from sparse_matrix_fine_tuning_tpu.quant import quantize_int8

    rng = np.random.default_rng(3)
    w = rng.normal(size=(256, 32)).astype(np.float32)  # (out, in)
    q_t, s = quantize_int8(w)  # (in, out), (1, out)
    x = jnp.asarray(rng.normal(size=(4, 32)), jnp.float32)
    fused = int8_matmul(x, jnp.asarray(q_t), jnp.asarray(s), interpret=True)
    wd = (jnp.asarray(q_t).astype(jnp.float32) * jnp.asarray(s))
    xla = x @ wd
    np.testing.assert_allclose(np.asarray(fused), np.asarray(xla),
                               rtol=1e-5, atol=1e-5)


def _nonzero_adapter_layer(bits, rngs_seed=0):
    """MonarchLinear adapter over a quantized base with a NONZERO delta
    (lora_style zero-init would make the merge vacuous)."""
    w = jax.random.normal(jax.random.PRNGKey(0), (128, 128)) * 0.1
    layer = MonarchLinear(128, 128, weights=w, rngs=nnx.Rngs(rngs_seed))
    layer.blkdiag2.set_value(
        jax.random.normal(jax.random.PRNGKey(7), layer.blkdiag2[...].shape)
        * 0.02)
    n = quantize_frozen_base(layer, bits=bits, group_size=64)
    assert n == 1
    return layer


def test_requantize_merge_close_and_one_way():
    """Serving-only requantized merge (quant.requantize_merge_adapters):
    output stays within quantization noise of the exact unmerged config,
    the adapter branch is skipped afterwards (merged=True), and the lossy
    merge cannot be unmerged (the exact-merge guard still raises)."""
    import pytest

    from sparse_matrix_fine_tuning_tpu.quant import requantize_merge_adapters

    for bits, tol in ((8, 0.02), (4, 0.15)):
        layer = _nonzero_adapter_layer(bits)
        x = jax.random.normal(jax.random.PRNGKey(1), (4, 128))
        ref = np.asarray(layer(x))  # exact: quant base + unmerged adapter
        assert requantize_merge_adapters(layer) == 1
        assert layer.merged
        out = np.asarray(layer(x))
        scale = np.abs(ref).max()
        diff = np.abs(out - ref).max()
        # the delta changed the codes, so outputs differ -- but only by
        # requantization noise of the merged matrix
        assert 0 < diff < tol * scale + 0.01, (bits, diff, scale)
        # one-way: the exact unmerge guard still refuses
        with pytest.raises(ValueError, match="quantized base"):
            layer.unmerge_adapter()
        # idempotent: nothing left to merge
        assert requantize_merge_adapters(layer) == 0


def test_requantize_merge_skips_branch_transforms():
    """Scaler-wrapped adapters cannot fold exactly into the dense codes at
    serving time; the requantized merge must skip them, not corrupt them."""
    from sparse_matrix_fine_tuning_tpu.quant import requantize_merge_adapters

    w = jax.random.normal(jax.random.PRNGKey(0), (128, 128)) * 0.1
    layer = MonarchLinear(128, 128, weights=w, rngs=nnx.Rngs(0),
                          peft_config={"scaler": True})
    quantize_frozen_base(layer, bits=8)
    assert requantize_merge_adapters(layer) == 0
    assert not layer.merged


def test_w8a8_serving_close():
    """quant.enable_w8a8_serving: int8 MXU dot with per-token activation
    quant must stay close to the exact dequant path (one extra ~1/127
    error term) and must only switch int8 layers."""
    from sparse_matrix_fine_tuning_tpu.quant import enable_w8a8_serving

    w = jax.random.normal(jax.random.PRNGKey(0), (128, 128)) * 0.1
    layer = MonarchLinear(128, 128, weights=w, rngs=nnx.Rngs(0))
    quantize_frozen_base(layer, bits=8)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 128))
    ref = np.asarray(layer(x))
    assert enable_w8a8_serving(layer) == 1
    out = np.asarray(layer(x))
    scale = np.abs(ref).max()
    diff = np.abs(out - ref).max()
    assert 0 < diff < 0.03 * scale + 0.01, (diff, scale)

    # int4 layers are not switchable (grouped scales can't ride the
    # int32 accumulator)
    layer4 = MonarchLinear(128, 128, weights=w, rngs=nnx.Rngs(0))
    quantize_frozen_base(layer4, bits=4, group_size=64)
    assert enable_w8a8_serving(layer4) == 0
