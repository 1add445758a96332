"""Import a reference-trained adapter checkpoint and match logits.

The migration path for a reference user: train Monarch adapters with the
reference's own surgery + torch AdamW, save the trainable-only state_dict
(what MyAwesomeTrainer.save_model writes, reference train_utils.py:297-307),
load it with ``peft.load_reference_adapters`` into a model adapted here with
the same peft_config, and the classifier logits must agree to f32 noise.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp
from flax import nnx

from sparse_matrix_fine_tuning_tpu.models import (
    RobertaConfig,
    RobertaForSequenceClassification,
)
from sparse_matrix_fine_tuning_tpu.models.hf_convert import load_roberta
from sparse_matrix_fine_tuning_tpu.peft import (
    init_monarch,
    load_reference_adapters,
)

PEFT_CONFIG = {
    "monarch": True, "nblocks": 4, "blk_r": 4, "blk_sz": None,
    "square": False, "adapter": True, "target_modules": ["query", "value"],
}


def _reference_trained_pair(ref_train_utils, scaler=False, steps=3):
    hf_cfg = transformers.RobertaConfig(
        vocab_size=128, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=66, type_vocab_size=1, pad_token_id=1,
        num_labels=3, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0)
    torch.manual_seed(0)
    hf_model = transformers.RobertaForSequenceClassification(hf_cfg)

    cfg = RobertaConfig.tiny(num_labels=3, hidden_dropout_prob=0.0,
                             attention_probs_dropout_prob=0.0)
    model = RobertaForSequenceClassification(cfg, rngs=nnx.Rngs(7))
    load_roberta(model, dict(hf_model.state_dict()))

    peft = dict(PEFT_CONFIG)
    if scaler:
        peft.update(scaler=True, scaler_type="diag", affine=True,
                    lora_style_init=False)
    ref_train_utils.init_monarch(hf_model, dict(peft))
    init_monarch(model, dict(peft), rngs=nnx.Rngs(1))

    # train the REFERENCE adapters so the checkpoint is non-trivial
    train = [(n, p) for n, p in hf_model.named_parameters()
             if ("blkdiag" in n or "classifier" in n or ".scaler." in n)]
    for n, p in hf_model.named_parameters():
        p.requires_grad_(any(n == tn for tn, _ in train))
    opt = torch.optim.AdamW([p for _, p in train], lr=5e-3)
    rng = np.random.default_rng(0)
    hf_model.train()
    for _ in range(steps):
        ids = torch.tensor(rng.integers(2, 128, size=(4, 10)))
        labels = torch.tensor(rng.integers(0, 3, size=(4,)))
        opt.zero_grad()
        out = hf_model(input_ids=ids,
                       attention_mask=torch.ones_like(ids), labels=labels)
        out.loss.backward()
        opt.step()
    # what the reference's trainable-only save_model writes
    sd = {n: p.detach().clone() for n, p in hf_model.named_parameters()
          if p.requires_grad}
    return hf_model, model, sd


def _logits_match(hf_model, model, atol, merged=False):
    """merged=False compares the exact (train-mode, dropout-0) forwards;
    merged=True compares reference ``.eval()`` (which folds the adapter into
    dense, reference monarch_linear.py:271-276) against our explicit
    ``merge_all_adapters``.  With a Scaler the fold passes LayerNorm through
    the identity -- a nonlinear branch -- so merged outputs differ from
    unmerged ones ON BOTH SIDES equally; parity of that quirk is what the
    merged comparison asserts."""
    from sparse_matrix_fine_tuning_tpu.peft import merge_all_adapters
    rng = np.random.default_rng(1)
    ids = rng.integers(2, 128, size=(5, 12))
    hf_model.eval() if merged else hf_model.train()
    with torch.no_grad():
        want = hf_model(input_ids=torch.tensor(ids),
                        attention_mask=torch.ones((5, 12), dtype=torch.long),
                        ).logits.numpy()
    model.eval()
    if merged:
        merge_all_adapters(model)
    got = np.asarray(model(jnp.asarray(ids), jnp.ones((5, 12), jnp.int32)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=atol)


def test_import_reference_monarch_checkpoint(ref, ref_train_utils):
    hf_model, model, sd = _reference_trained_pair(ref_train_utils)
    assert any(k.endswith("blkdiag1") for k in sd)
    assert any(k.startswith("classifier") for k in sd)

    loaded, skipped = load_reference_adapters(model, sd)
    assert not skipped and len(loaded) == len(sd)
    _logits_match(hf_model, model, atol=2e-5)
    _logits_match(hf_model, model, atol=2e-5, merged=True)


def test_import_reference_checkpoint_with_scaler(ref, ref_train_utils):
    hf_model, model, sd = _reference_trained_pair(ref_train_utils,
                                                  scaler=True)
    assert any(".scaler.scaler" in k for k in sd)
    loaded, skipped = load_reference_adapters(model, sd)
    assert not skipped and len(loaded) == len(sd)
    _logits_match(hf_model, model, atol=2e-5)
    # the Scaler branch is nonlinear (LayerNorm): folding it through the
    # identity changes outputs -- identically on both sides
    _logits_match(hf_model, model, atol=5e-5, merged=True)


def test_import_errors_are_actionable(ref, ref_train_utils):
    _, model, sd = _reference_trained_pair(ref_train_utils)
    # wrong blk_r: shape mismatch names the key and suggests the cause
    bad = dict(sd)
    k1 = next(k for k in bad if k.endswith("blkdiag1"))
    bad[k1] = torch.zeros(4, 8, 8)
    with pytest.raises(ValueError, match="peft_config"):
        load_reference_adapters(model, bad)
    # unknown key: strict raises, non-strict skips and reports
    bad = dict(sd)
    bad["roberta.encoder.layer.0.attention.self.query.nonsense"] = \
        torch.zeros(1)
    with pytest.raises(KeyError, match="nonsense"):
        load_reference_adapters(model, bad)
    loaded, skipped = load_reference_adapters(model, bad, strict=False)
    assert skipped == ["roberta.encoder.layer.0.attention.self.query.nonsense"]
    assert len(loaded) == len(sd)


def test_import_llama_style_keys_roundtrip():
    """qlora-flow checkpoints use ``model.layers.N.self_attn.q_proj.*`` paths
    (reference qlora_monarch.py surgery over find_all_linear_names); the
    importer must resolve them onto LlamaForCausalLM."""
    from sparse_matrix_fine_tuning_tpu.models import (
        LlamaConfig,
        LlamaForCausalLM,
    )
    from sparse_matrix_fine_tuning_tpu.utils.testing import fresh_model

    cfg = LlamaConfig.tiny()
    model = fresh_model(LlamaForCausalLM, cfg)
    init_monarch(model, {
        "monarch": True, "nblocks": 2, "blk_r": 2, "adapter": True,
        "target_modules": ["q_proj", "v_proj"]}, rngs=nnx.Rngs(1))

    rng = np.random.default_rng(0)
    sd = {}
    for i in range(cfg.num_hidden_layers):
        for name in ("q_proj", "v_proj"):
            mod = getattr(model.model.layers[i].self_attn, name)
            for leaf in ("blkdiag1", "blkdiag2"):
                shape = tuple(getattr(mod, leaf)[...].shape)
                sd[f"model.layers.{i}.self_attn.{name}.{leaf}"] = \
                    rng.normal(size=shape).astype(np.float32)

    loaded, skipped = load_reference_adapters(model, sd)
    assert len(loaded) == len(sd) and not skipped
    for k, v in sd.items():
        parts = k.split(".")
        mod = model
        for tok in parts[:-1]:
            mod = mod[int(tok)] if tok.isdigit() else getattr(mod, tok)
        np.testing.assert_array_equal(
            np.asarray(getattr(mod, parts[-1])[...]), v)


def test_export_reference_adapters_roundtrip(ref, ref_train_utils):
    """Reverse migration: adapters trained HERE export to the reference's
    key format and load into the reference's own torch modules with logit
    parity (train-mode forwards; dropout 0)."""
    from sparse_matrix_fine_tuning_tpu.peft import export_reference_adapters

    hf_model, model, _ = _reference_trained_pair(ref_train_utils, steps=0)

    # "train" our side: perturb every adapter factor + the classifier
    rng = np.random.default_rng(5)
    for i in range(2):
        for name in ("query", "value"):
            ol = getattr(model.roberta.layer[i].attention.self, name)
            for leaf in ("blkdiag1", "blkdiag2"):
                p = getattr(ol, leaf)
                p.set_value(jnp.asarray(
                    rng.normal(0, 0.05, p[...].shape).astype(np.float32)))
    model.classifier.dense.kernel.set_value(jnp.asarray(
        rng.normal(0, 0.05, (32, 32)).astype(np.float32)))

    sd = export_reference_adapters(model)
    assert "roberta.encoder.layer.0.attention.self.query.blkdiag1" in sd
    assert "classifier.dense.weight" in sd
    missing, unexpected = hf_model.load_state_dict(
        {k: torch.tensor(v) for k, v in sd.items()}, strict=False)
    assert not unexpected, unexpected
    assert all("blkdiag" not in k and "classifier" not in k for k in missing)

    _logits_match(hf_model, model, atol=2e-5)
