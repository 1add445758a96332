"""Tiny-model forward/shape/loss sanity for RoBERTa and Llama."""

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from sparse_matrix_fine_tuning_tpu.models import (
    LlamaConfig,
    LlamaForCausalLM,
    RobertaConfig,
    RobertaForSequenceClassification,
)
from sparse_matrix_fine_tuning_tpu.models.llama import init_caches
from sparse_matrix_fine_tuning_tpu.models.roberta import create_position_ids
from sparse_matrix_fine_tuning_tpu.utils.testing import fresh_model


def test_roberta_forward_and_loss():
    cfg = RobertaConfig.tiny()
    model = fresh_model(RobertaForSequenceClassification, cfg)
    ids = jax.random.randint(jax.random.PRNGKey(0), (2, 16), 0, cfg.vocab_size)
    logits = model(ids)
    assert logits.shape == (2, cfg.num_labels)
    labels = jnp.array([0, 1])
    loss = model.loss(logits, labels)
    assert loss.shape == () and float(loss) > 0


def test_roberta_position_ids():
    ids = jnp.array([[5, 6, 1, 1], [7, 8, 9, 1]])  # pad_token_id = 1
    pos = create_position_ids(ids, 1)
    np.testing.assert_array_equal(np.asarray(pos), [[2, 3, 1, 1], [2, 3, 4, 1]])


def test_roberta_mask_invariance():
    # padded positions must not affect unpadded outputs
    cfg = RobertaConfig.tiny()
    model = fresh_model(RobertaForSequenceClassification, cfg)
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, 8), 2, cfg.vocab_size)
    mask = jnp.ones((1, 8), jnp.int32)
    full = model(ids, mask)
    padded_ids = jnp.concatenate([ids, jnp.full((1, 4), cfg.pad_token_id)], axis=1)
    padded_mask = jnp.concatenate([mask, jnp.zeros((1, 4), jnp.int32)], axis=1)
    padded = model(padded_ids, padded_mask)
    np.testing.assert_allclose(np.asarray(full), np.asarray(padded), rtol=1e-4, atol=1e-5)


def test_llama_forward_and_loss():
    cfg = LlamaConfig.tiny()
    model = fresh_model(LlamaForCausalLM, cfg)
    ids = jax.random.randint(jax.random.PRNGKey(2), (2, 12), 0, cfg.vocab_size)
    logits = model(ids)
    assert logits.shape == (2, 12, cfg.vocab_size)
    labels = ids.at[:, :4].set(-100)
    loss = model.loss(logits, labels)
    assert float(loss) > 0


def test_llama_remat_policies_grad_equivalence():
    """remat (both policies) changes memory scheduling only: loss and
    embedding gradients match the non-remat forward/backward exactly."""
    ids = jax.random.randint(jax.random.PRNGKey(3), (2, 12), 0, 256)

    def loss_and_grad(remat, policy="nothing"):
        cfg = LlamaConfig.tiny(remat=remat, remat_policy=policy)
        model = fresh_model(LlamaForCausalLM, cfg)

        def f(m):
            return m.loss(m(ids), ids)

        loss, grads = nnx.value_and_grad(f)(model)
        g = grads["model"]["embed_tokens"]["embedding"].value
        return float(loss), np.asarray(g)

    base_loss, base_g = loss_and_grad(False)
    for policy in ("nothing", "dots"):
        loss, g = loss_and_grad(True, policy)
        np.testing.assert_allclose(loss, base_loss, rtol=1e-6)
        np.testing.assert_allclose(g, base_g, rtol=1e-5, atol=1e-6)


def test_llama_causality():
    cfg = LlamaConfig.tiny()
    model = fresh_model(LlamaForCausalLM, cfg)
    ids = jax.random.randint(jax.random.PRNGKey(3), (1, 10), 0, cfg.vocab_size)
    base = model(ids)
    perturbed = ids.at[0, 7].set((ids[0, 7] + 1) % cfg.vocab_size)
    out = model(perturbed)
    # positions < 7 unaffected; position >= 7 changes
    np.testing.assert_allclose(np.asarray(base[:, :7]), np.asarray(out[:, :7]),
                               rtol=1e-4, atol=1e-5)
    assert float(jnp.abs(base[:, 7:] - out[:, 7:]).max()) > 1e-4


def test_llama_kv_cache_matches_full_forward():
    cfg = LlamaConfig.tiny()
    model = fresh_model(LlamaForCausalLM, cfg)
    T = 6
    ids = jax.random.randint(jax.random.PRNGKey(4), (1, T), 0, cfg.vocab_size)
    full_logits = model(ids)

    caches = init_caches(cfg, 1, T, dtype=jnp.float32)
    step_logits = []
    for t in range(T):
        mask = (jnp.arange(T) <= t).astype(jnp.int32)[None]
        pos = jnp.array([[t]])
        out, caches = model(ids[:, t:t+1], attention_mask=mask, positions=pos,
                            caches=caches, cache_index=t)
        step_logits.append(out[:, 0])
    step_logits = jnp.stack(step_logits, axis=1)
    np.testing.assert_allclose(np.asarray(step_logits), np.asarray(full_logits),
                               rtol=2e-3, atol=2e-3)


def test_llama_gqa_heads():
    cfg = LlamaConfig.tiny(num_key_value_heads=2, num_attention_heads=4)
    model = fresh_model(LlamaForCausalLM, cfg)
    ids = jax.random.randint(jax.random.PRNGKey(5), (2, 8), 0, cfg.vocab_size)
    assert model(ids).shape == (2, 8, cfg.vocab_size)


def test_roberta_dropout_follows_train_eval_mode():
    """Training-mode forwards must be stochastic (dropout ON, matching the
    reference recipe's hidden/attention dropout 0.1) and eval-mode forwards
    deterministic -- governed by nnx.train()/eval(), not a hardcoded
    deterministic=True default (round-1 regression)."""
    cfg = RobertaConfig.tiny()
    model = fresh_model(RobertaForSequenceClassification, cfg)
    ids = jax.random.randint(jax.random.PRNGKey(2), (2, 16), 2, cfg.vocab_size)

    model.train()
    a = np.asarray(model(ids))
    b = np.asarray(model(ids))
    assert not np.allclose(a, b), "train-mode forwards identical: dropout is off"

    model.eval()
    c = np.asarray(model(ids))
    d = np.asarray(model(ids))
    np.testing.assert_allclose(c, d)


def test_roberta_layer_hooks_block_output_and_input():
    """RoBERTa hook points (pyvene component addressing) actually fire and
    alter the logits; unknown components are rejected."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import pytest
    from flax import nnx

    from sparse_matrix_fine_tuning_tpu.models import (
        RobertaConfig, RobertaForSequenceClassification)
    from sparse_matrix_fine_tuning_tpu.utils.testing import fresh_model

    cfg = RobertaConfig.tiny(num_labels=2)
    model = fresh_model(RobertaForSequenceClassification, cfg)
    ids = jax.random.randint(jax.random.PRNGKey(0), (2, 8), 4,
                             cfg.vocab_size)
    base = np.asarray(model(ids))
    bumped = np.asarray(model(ids, layer_hooks={1: lambda h: h + 1.0}))
    assert np.abs(bumped - base).max() > 1e-5
    # uniform shifts/scales pass through LayerNorm almost unchanged, so the
    # block_input perturbation must be non-uniform across features
    pre = np.asarray(model(
        ids, layer_hooks={(0, "block_input"): lambda h: jnp.flip(h, -1)}))
    assert np.abs(pre - base).max() > 1e-5
    # identity hooks leave logits exactly unchanged
    same = np.asarray(model(
        ids, layer_hooks={0: lambda h: h, (1, "block_input"): lambda h: h}))
    np.testing.assert_array_equal(same, base)
    with pytest.raises(AssertionError):
        model(ids, layer_hooks={(0, "attention_output"): lambda h: h})
