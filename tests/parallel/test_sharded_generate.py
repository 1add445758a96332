"""Sharded generation: decode with a mesh-sharded model matches unsharded.

The reasoning harness's generation eval (evaluation/reasoning.py) must run
against a 7B base that is fsdp/tp-sharded on a pod; the decode fns in
models/generate.py take the model state as a jit argument, so GSPMD
propagates whatever NamedShardings the trainer placed.  This locks the
capability: token-exact greedy output, fsdp- and tp-sharded vs unsharded.
"""

import jax
import numpy as np
import pytest
from flax import nnx

from sparse_matrix_fine_tuning_tpu.models import LlamaConfig, LlamaForCausalLM
from sparse_matrix_fine_tuning_tpu.models.generate import (
    GenerationConfig,
    generate,
)
from sparse_matrix_fine_tuning_tpu.parallel import make_mesh, shard_state
from sparse_matrix_fine_tuning_tpu.peft import init_monarch
from sparse_matrix_fine_tuning_tpu.utils.testing import fresh_model

needs_mesh = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def _model(vocab=128, hidden=256, layers=2, heads=4, inter=512):
    cfg = LlamaConfig(
        vocab_size=vocab, hidden_size=hidden, num_hidden_layers=layers,
        num_attention_heads=heads, num_key_value_heads=heads // 2,
        intermediate_size=inter, max_position_embeddings=64,
    )
    model = fresh_model(LlamaForCausalLM, cfg)
    init_monarch(model, {
        "monarch": True, "nblocks": 4, "blk_r": 4, "adapter": True,
        "target_modules": ["q_proj", "v_proj", "o_proj", "up_proj"],
    }, rngs=nnx.Rngs(1))
    return cfg, model


def _shard_like_trainer(model, mesh):
    """Same placement the Trainer applies: frozen base sharded by the
    fsdp/tp rules, adapters replicated (training/trainer.py mesh block)."""
    from sparse_matrix_fine_tuning_tpu.peft.surgery import trainable_filter

    filt = trainable_filter()
    frozen = nnx.All(nnx.Param, nnx.Not(filt))
    nnx.update(model, shard_state(nnx.state(model, frozen), mesh))
    nnx.update(model, shard_state(nnx.state(model, filt), mesh,
                                  replicate=True))


@needs_mesh
@pytest.mark.parametrize("axes", [dict(dp=1, fsdp=8, tp=1),
                                  dict(dp=2, fsdp=2, tp=2)])
def test_sharded_greedy_matches_unsharded(axes):
    cfg, plain = _model()
    rng = np.random.default_rng(0)
    b, t = 4, 12
    ids = rng.integers(2, cfg.vocab_size, size=(b, t)).astype(np.int32)
    mask = np.ones((b, t), np.int32)
    mask[0, :3] = 0   # left padding
    ids[0, :3] = 0
    gcfg = GenerationConfig(max_new_tokens=8, eos_token_id=None,
                            pad_token_id=0)

    ref = np.asarray(generate(plain, ids, mask, gcfg))

    cfg2, sharded = _model()
    _shard_like_trainer(sharded, make_mesh(**axes))
    q = sharded.model.layers[0].self_attn.q_proj.dense[...]
    assert any(s is not None for s in (q.sharding.spec or [None]))

    out = np.asarray(generate(sharded, ids, mask, gcfg))
    np.testing.assert_array_equal(ref, out)


@needs_mesh
def test_sharded_quantized_serving_matches_unsharded():
    """The measured-best serving config (int8 frozen base + w8a8 int8
    lm_head + unmerged adapters -- docs/BENCHMARKS.md decode table) must
    stay token-exact when the model is mesh-sharded: quantized Params and
    QuantScales flow through the same GSPMD placement as everything else."""
    from sparse_matrix_fine_tuning_tpu.quant import (
        quantize_frozen_base, quantize_lm_head)

    cfg, plain = _model()
    quantize_frozen_base(plain, bits=8)
    assert quantize_lm_head(plain, impl="w8a8")
    rng = np.random.default_rng(1)
    b, t = 2, 10
    ids = rng.integers(2, cfg.vocab_size, size=(b, t)).astype(np.int32)
    mask = np.ones((b, t), np.int32)
    gcfg = GenerationConfig(max_new_tokens=6, eos_token_id=None,
                            pad_token_id=0)
    ref = np.asarray(generate(plain, ids, mask, gcfg))

    _, sharded = _model()
    quantize_frozen_base(sharded, bits=8)
    assert quantize_lm_head(sharded, impl="w8a8")
    _shard_like_trainer(sharded, make_mesh(dp=2, fsdp=2, tp=2))
    out = np.asarray(generate(sharded, ids, mask, gcfg))
    np.testing.assert_array_equal(ref, out)
