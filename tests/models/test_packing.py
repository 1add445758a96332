"""Sequence packing: segment-masked attention + per-segment RoPE restart
(models/llama.py segment_ids) and the bin-packer (data/alpaca.pack_causal_lm).

The defining property: a packed forward is EXACTLY equivalent to running
each example alone -- same logits at each example's positions.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from sparse_matrix_fine_tuning_tpu.data.alpaca import pack_causal_lm
from sparse_matrix_fine_tuning_tpu.data.reasoning import IGNORE_INDEX
from sparse_matrix_fine_tuning_tpu.data.tokenizer import SimpleTokenizer
from sparse_matrix_fine_tuning_tpu.models import LlamaConfig, LlamaForCausalLM
from sparse_matrix_fine_tuning_tpu.utils.testing import fresh_model


@pytest.fixture(scope="module")
def model():
    cfg = LlamaConfig.tiny(vocab_size=256, hidden_size=64,
                           num_hidden_layers=2, num_attention_heads=4,
                           num_key_value_heads=2, intermediate_size=128,
                           max_position_embeddings=64)
    return cfg, fresh_model(LlamaForCausalLM, cfg)


def test_packed_forward_matches_individual(model):
    cfg, m = model
    rng = np.random.default_rng(0)
    a = rng.integers(2, cfg.vocab_size, size=7)
    b = rng.integers(2, cfg.vocab_size, size=11)
    c = rng.integers(2, cfg.vocab_size, size=5)
    T = 32
    ids = np.zeros((1, T), np.int32)
    seg = np.zeros((1, T), np.int32)
    pos = 0
    for s, x in enumerate((a, b, c), start=1):
        ids[0, pos:pos + len(x)] = x
        seg[0, pos:pos + len(x)] = s
        pos += len(x)
    mask = (seg > 0).astype(np.int32)

    with jax.default_matmul_precision("float32"):
        packed = np.asarray(m(jnp.asarray(ids), attention_mask=jnp.asarray(mask),
                              segment_ids=jnp.asarray(seg)), np.float32)
        off = 0
        for x in (a, b, c):
            alone = np.asarray(m(jnp.asarray(x[None, :])), np.float32)
            got = packed[0, off:off + len(x)]
            np.testing.assert_allclose(got, alone[0], rtol=2e-4, atol=2e-4)
            off += len(x)
        # and WITHOUT segment ids the same row does NOT match (examples
        # attend across the seam) -- guards against the mask being a no-op
        unpacked = np.asarray(m(jnp.asarray(ids), attention_mask=jnp.asarray(mask)),
                              np.float32)
        assert np.abs(unpacked[0, 7:18] - packed[0, 7:18]).max() > 1e-3


def test_packed_loss_grads_flow(model):
    cfg, m = model
    rng = np.random.default_rng(1)
    ids = rng.integers(2, cfg.vocab_size, size=(2, 24)).astype(np.int32)
    seg = np.repeat([[1, 2, 3]], 2, axis=0).repeat(8, axis=1)
    labels = ids.copy()
    labels[seg == 0] = IGNORE_INDEX

    def loss_fn(m):
        logits = m(jnp.asarray(ids), attention_mask=jnp.asarray((seg > 0).astype(np.int32)),
                   segment_ids=jnp.asarray(seg))
        return m.loss(logits, jnp.asarray(labels))

    val, grads = nnx.value_and_grad(loss_fn)(m)
    assert np.isfinite(float(val))
    gsum = sum(float(jnp.abs(g).sum()) for g in jax.tree.leaves(grads))
    assert gsum > 0


def test_pack_causal_lm_covers_and_respects_bounds():
    tok = SimpleTokenizer(vocab_size=512)
    items = [{"instruction": f"Repeat the word token{i % 5}", "input": "",
              "output": f"token{i % 5}"} for i in range(40)]
    data, eff = pack_causal_lm(items, tok, max_len=128, source_max_len=96,
                               target_max_len=32)
    ids, seg, labels = data["input_ids"], data["segment_ids"], data["labels"]
    assert ids.shape[1] == 128
    assert ids.shape[0] < 40, "packing must reduce the row count"
    assert 0.5 < eff <= 1.0
    # every example present exactly once: count segments across rows
    n_segments = sum(len(set(row[row > 0])) for row in seg)
    assert n_segments == 40
    # each segment's first token label is IGNORE (seam masking)
    for r in range(ids.shape[0]):
        for s in set(seg[r][seg[r] > 0]):
            first = np.argmax(seg[r] == s)
            assert labels[r, first] == IGNORE_INDEX
    # attention mask matches non-pad
    np.testing.assert_array_equal(data["attention_mask"], (seg > 0))


def test_pack_tokenized_reasoning_rows():
    """Generic packer over pre-tokenized rows (run_reasoning path): handles
    the leading masked sink token and preserves per-token labels."""
    from sparse_matrix_fine_tuning_tpu.data.alpaca import pack_tokenized
    from sparse_matrix_fine_tuning_tpu.data.reasoning import tokenize_reasoning
    tok = SimpleTokenizer(vocab_size=512)
    items = [{"instruction": f"compute {i} plus {i}", "output": str(2 * i),
              "answer": str(2 * i)} for i in range(20)]
    data = tokenize_reasoning("math", items, tok, max_length=64, split="train")
    data = {k: v for k, v in data.items()
            if k in ("input_ids", "attention_mask", "labels")}
    packed, eff = pack_tokenized(data, 128)
    assert packed["input_ids"].shape[0] < 20
    assert 0.3 < eff <= 1.0
    n_segments = sum(len(set(row[row > 0])) for row in packed["segment_ids"])
    assert n_segments == 20
    # the supervised target tokens all survive packing
    orig_targets = int(((np.asarray(data["labels"]) != IGNORE_INDEX)
                        & (np.asarray(data["attention_mask"]) > 0)).sum())
    packed_targets = int((packed["labels"] != IGNORE_INDEX).sum())
    # each segment loses at most its first token to seam masking
    assert orig_targets - 20 <= packed_targets <= orig_targets


def test_packed_step_on_virtual_mesh(tmp_path):
    """A packed training step runs under (dp, fsdp, tp) sharding -- the
    segment bias (b,1,t,t) shards with the batch like the padding mask."""
    from sparse_matrix_fine_tuning_tpu.parallel import make_mesh
    from sparse_matrix_fine_tuning_tpu.peft import init_monarch
    from sparse_matrix_fine_tuning_tpu.training import Trainer, TrainingArgs

    cfg = LlamaConfig.tiny(vocab_size=64, hidden_size=64,
                           num_hidden_layers=2, num_attention_heads=4,
                           num_key_value_heads=2, intermediate_size=128,
                           max_position_embeddings=32)
    m = fresh_model(LlamaForCausalLM, cfg)
    init_monarch(m, {"monarch": True, "nblocks": 4, "blk_r": 4,
                     "adapter": True, "target_modules": ["q_proj", "v_proj"]},
                 rngs=nnx.Rngs(1))
    rng = np.random.default_rng(0)
    ids = rng.integers(2, 64, size=(8, 24)).astype(np.int32)
    seg = np.repeat([[1, 2, 3]], 8, axis=0).repeat(8, axis=1)
    labels = np.where(seg > 0, ids, IGNORE_INDEX)
    data = {"input_ids": ids, "attention_mask": (seg > 0).astype(np.int32),
            "segment_ids": seg, "labels": labels}

    def lm_loss(model, batch, train):
        logits = model(batch["input_ids"],
                       attention_mask=batch["attention_mask"],
                       segment_ids=batch.get("segment_ids"))
        return model.loss(logits, batch["labels"], weights=batch.get("_valid"))

    mesh = make_mesh(dp=2, fsdp=2, tp=2)
    args = TrainingArgs(output_dir=str(tmp_path), learning_rate=1e-3,
                        max_steps=1, per_device_train_batch_size=8,
                        logging_steps=0, log_param_steps=0)
    t = Trainer(m, args, train_data=data, loss_fn=lm_loss, mesh=mesh)
    batch, _ = next(t._batches(data, 8, shuffle=False))
    t.model.train()
    loss = float(t._train_step(t.model, t.optimizer, batch))
    assert np.isfinite(loss)


def test_packed_training_learns(tmp_path):
    """End-to-end: packed next-token task trains and loss decreases."""
    from sparse_matrix_fine_tuning_tpu.peft import init_monarch
    from sparse_matrix_fine_tuning_tpu.training import Trainer, TrainingArgs

    cfg = LlamaConfig.tiny(vocab_size=64, hidden_size=64,
                           num_hidden_layers=2, num_attention_heads=4,
                           num_key_value_heads=2, intermediate_size=128,
                           max_position_embeddings=64)
    m = fresh_model(LlamaForCausalLM, cfg)
    init_monarch(m, {"monarch": True, "nblocks": 4, "blk_r": 4,
                     "adapter": True, "target_modules": ["q_proj", "v_proj"]},
                 rngs=nnx.Rngs(1))
    rng = np.random.default_rng(0)
    # learnable pattern: each segment is "x x x x" repetition
    rows, segs = [], []
    for _ in range(32):
        row, seg = [], []
        pos, s = 0, 1
        while pos + 8 <= 48:
            tokv = int(rng.integers(2, 64))
            row += [tokv] * 8
            seg += [s] * 8
            pos += 8
            s += 1
        rows.append(row + [0] * (48 - len(row)))
        segs.append(seg + [0] * (48 - len(seg)))
    ids = np.array(rows, np.int32)
    seg = np.array(segs, np.int32)
    labels = np.where(seg > 0, ids, IGNORE_INDEX)
    data = {"input_ids": ids, "attention_mask": (seg > 0).astype(np.int32),
            "segment_ids": seg, "labels": labels}

    def lm_loss(model, batch, train):
        logits = model(batch["input_ids"],
                       attention_mask=batch["attention_mask"],
                       segment_ids=batch.get("segment_ids"))
        return model.loss(logits, batch["labels"], weights=batch.get("_valid"))

    args = TrainingArgs(output_dir=str(tmp_path), learning_rate=1e-2,
                        num_train_epochs=3, per_device_train_batch_size=8,
                        logging_steps=0, log_param_steps=0, warmup_ratio=0.0)
    t = Trainer(m, args, train_data=data, eval_data=data, loss_fn=lm_loss)
    first = t.evaluate()["eval_loss"]
    final = t.train()["eval_loss"]
    assert final < first
