"""Model surgery: adapter injection, freezing semantics, merge-all."""

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from sparse_matrix_fine_tuning_tpu.layers import MonarchLinear
from sparse_matrix_fine_tuning_tpu.models import (
    LlamaConfig,
    LlamaForCausalLM,
    RobertaConfig,
    RobertaForSequenceClassification,
)
from sparse_matrix_fine_tuning_tpu.peft import (
    find_all_linear_names,
    init_lora,
    init_monarch,
    merge_all_adapters,
    param_stats,
    unmerge_all_adapters,
)
from sparse_matrix_fine_tuning_tpu.peft.surgery import split_trainable
from sparse_matrix_fine_tuning_tpu.utils.testing import fresh_model

ROBERTA_PEFT = {"monarch": True, "nblocks": 4, "blk_r": 4, "blk_sz": None,
                "adapter": True, "target_modules": ["query", "value", "key"]}
LLAMA_PEFT = {"monarch": True, "nblocks": 4, "blk_r": 4, "adapter": True,
              "target_modules": ["q_proj", "v_proj", "k_proj", "o_proj",
                                 "gate_proj", "up_proj", "down_proj"]}


def test_roberta_surgery_preserves_forward():
    cfg = RobertaConfig.tiny()
    model = fresh_model(RobertaForSequenceClassification, cfg)
    ids = jax.random.randint(jax.random.PRNGKey(0), (2, 16), 0, cfg.vocab_size)
    before = model(ids)
    adapted = init_monarch(model, ROBERTA_PEFT, rngs=nnx.Rngs(1))
    # q/k/v in each of 2 layers
    assert len(adapted) == 6
    after = model(ids)
    # zero-init second factor: forward identical after surgery
    np.testing.assert_allclose(np.asarray(before), np.asarray(after), rtol=1e-5, atol=1e-5)


def test_llama_surgery_counts():
    cfg = LlamaConfig.tiny()
    model = fresh_model(LlamaForCausalLM, cfg)
    adapted = init_monarch(model, LLAMA_PEFT, rngs=nnx.Rngs(1))
    assert len(adapted) == 7 * cfg.num_hidden_layers
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 8), 0, cfg.vocab_size)
    assert model(ids).shape == (2, 8, cfg.vocab_size)


def test_trainable_split_excludes_base():
    cfg = RobertaConfig.tiny()
    model = fresh_model(RobertaForSequenceClassification, cfg)
    init_monarch(model, ROBERTA_PEFT, rngs=nnx.Rngs(1))
    _, trainable, frozen = split_trainable(model)
    t_paths = {"/".join(map(str, p)) for p, _ in trainable.flat_state()}
    f_paths = {"/".join(map(str, p)) for p, _ in frozen.flat_state()}
    assert any("blkdiag1" in p for p in t_paths)
    assert any("classifier" in p for p in t_paths)
    assert not any("blkdiag" in p for p in f_paths)
    assert not any("dense" in p for p in t_paths if "classifier" not in p)
    assert any("embeddings" in p for p in f_paths)
    total, train = param_stats(model, verbose=False)
    assert 0 < train < total * 0.2


def test_merge_all_roundtrip():
    cfg = RobertaConfig.tiny()
    model = fresh_model(RobertaForSequenceClassification, cfg)
    init_monarch(model, ROBERTA_PEFT, rngs=nnx.Rngs(1))
    # give the adapters some signal
    for _, _, child in list(
            __import__("sparse_matrix_fine_tuning_tpu.peft.surgery",
                       fromlist=["_iter_parents"])._iter_parents(model)):
        if isinstance(child, MonarchLinear):
            child.blkdiag2.set_value(jax.random.normal(
                jax.random.PRNGKey(2), child.blkdiag2[...].shape) * 0.05)
    ids = jax.random.randint(jax.random.PRNGKey(3), (2, 16), 0, cfg.vocab_size)
    before = model(ids)
    n = merge_all_adapters(model)
    assert n == 6
    np.testing.assert_allclose(np.asarray(model(ids)), np.asarray(before),
                               rtol=1e-4, atol=1e-4)
    unmerge_all_adapters(model)
    np.testing.assert_allclose(np.asarray(model(ids)), np.asarray(before),
                               rtol=1e-4, atol=1e-4)


def test_find_all_linear_names():
    cfg = LlamaConfig.tiny()
    model = fresh_model(LlamaForCausalLM, cfg)
    names = find_all_linear_names(model)
    assert set(names) == {"q_proj", "k_proj", "v_proj", "o_proj",
                          "gate_proj", "up_proj", "down_proj"}


def test_init_lora():
    cfg = RobertaConfig.tiny()
    model = fresh_model(RobertaForSequenceClassification, cfg)
    ids = jax.random.randint(jax.random.PRNGKey(0), (2, 16), 0, cfg.vocab_size)
    before = model(ids)
    adapted = init_lora(model, {"target_modules": ["query", "value"], "r": 4},
                        rngs=nnx.Rngs(1))
    assert len(adapted) == 4
    after = model(ids)
    assert after.shape == before.shape

def test_family_surgery_and_grads():
    """Monarch surgery composes with the sibling causal-LM families: the
    Qwen2-style biased q/k/v keeps its bias through replacement (forward
    preserved at zero-init), Gemma-style decoupled head_dim adapts the
    rectangular q_proj, the Mistral window survives the adapted forward,
    and gradients actually reach the injected factors."""
    for fam_kw in (
        dict(attention_qkv_bias=True),                      # qwen2
        dict(head_dim=16, num_key_value_heads=1,            # gemma
             mlp_activation="gelu_tanh", rmsnorm_unit_offset=True,
             scale_embeddings=True, tie_word_embeddings=True),
        dict(sliding_window=5),                             # mistral
    ):
        cfg = LlamaConfig.tiny(**fam_kw)
        model = LlamaForCausalLM(cfg, rngs=nnx.Rngs(0))
        ids = jax.random.randint(jax.random.PRNGKey(0), (2, 8), 0,
                                 cfg.vocab_size)
        before = model(ids)
        init_monarch(model, LLAMA_PEFT, rngs=nnx.Rngs(1))
        np.testing.assert_allclose(np.asarray(before), np.asarray(model(ids)),
                                   rtol=1e-5, atol=1e-5)

        def loss_fn(m):
            return m.loss(m(ids), ids)

        loss, grads = nnx.value_and_grad(loss_fn)(model)
        assert jnp.isfinite(loss)
        gflat = {"/".join(map(str, p)): g
                 for p, g in nnx.state(grads).flat_state()}
        blk = [v for k, v in gflat.items() if "blkdiag" in k]
        assert len(blk) == 2 * 7 * cfg.num_hidden_layers
        assert all(jnp.isfinite(g[...]).all() for g in blk)
        # blkdiag2 is zero-init, so its grad (through the nonzero blkdiag1)
        # is the one that must be nonzero at step 0; blkdiag1's is exactly
        # zero by the product rule
        blk2 = [v for k, v in gflat.items() if "blkdiag2" in k]
        assert any(float(jnp.abs(g[...]).max()) > 0 for g in blk2)
