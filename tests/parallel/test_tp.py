"""Tensor-parallel ("tp" axis) sharding: Megatron col/row rules + parity.

The reference has no distributed code (SURVEY.md section 2.6); tp is part
of this repo's TPU-native scaling story: column-parallel q/k/v/gate/up,
row-parallel o/down over the "tp" mesh axis, with XLA SPMD inserting the
collectives.  Verified here on the virtual 8-device CPU mesh: specs land
on the right dims, and sharded eval/train losses match the unsharded run.
"""

import jax
import numpy as np
import pytest
from flax import nnx
from jax.sharding import PartitionSpec as P

from sparse_matrix_fine_tuning_tpu.models import LlamaConfig, LlamaForCausalLM
from sparse_matrix_fine_tuning_tpu.parallel import make_mesh
from sparse_matrix_fine_tuning_tpu.parallel.sharding import param_spec
from sparse_matrix_fine_tuning_tpu.peft import init_monarch
from sparse_matrix_fine_tuning_tpu.training import Trainer, TrainingArgs

import jax.numpy as jnp
from sparse_matrix_fine_tuning_tpu.utils.testing import fresh_model


def test_tp_param_spec_rules():
    big = jnp.zeros((512, 512))
    # column-parallel MonarchLinear dense (out, in): tp on dim 0
    assert param_spec(big, 2, 2, "['q_proj']['dense'].value") == P("tp", "fsdp")
    # row-parallel dense (out, in): tp on dim 1
    assert param_spec(big, 2, 2, "['o_proj']['dense'].value") == P("fsdp", "tp")
    # nnx.Linear kernel (in, out) orientations flip
    assert param_spec(big, 2, 2, "['lm_head']['kernel'].value") == P("fsdp", "tp")
    assert param_spec(big, 2, 2, "['down_proj']['kernel'].value") == P("tp", "fsdp")
    # small col param still gets tp (compute partitioning), no fsdp
    small = jnp.zeros((128, 256))
    assert param_spec(small, 2, 2, "['k_proj']['dense'].value") == P("tp", None)
    # non-matching path: fsdp-only as before
    assert param_spec(big, 2, 2, "['embed_tokens']['embedding'].value") == \
        P("fsdp", None)
    # tp=1 mesh: identical to the legacy behaviour
    assert param_spec(big, 2, 1, "['q_proj']['dense'].value") == P("fsdp", None)
    # indivisible tp dim: rule backs off to fsdp placement
    odd = jnp.zeros((130, 512))
    assert param_spec(odd, 2, 4, "['q_proj']['dense'].value") == P(None, "fsdp")


def test_tp_param_spec_quantized_in_major():
    # A quantized dense (int8/uint8 leaf) is stored IN-MAJOR (quant/):
    # int4 packed_t (in/2, out), int8 values (in, out) -- so the tp dim
    # flips relative to the bf16 (out, in) dense orientation.
    packed4 = jnp.zeros((256, 512), jnp.uint8)   # (in/2, out)
    assert param_spec(packed4, 2, 2, "['q_proj']['dense'].value") == \
        P("fsdp", "tp")       # column-parallel: out features = dim 1
    assert param_spec(packed4, 2, 2, "['o_proj']['dense'].value") == \
        P("tp", "fsdp")       # row-parallel: input features = dim 0
    vals8 = jnp.zeros((512, 512), jnp.int8)      # (in, out)
    assert param_spec(vals8, 2, 2, "['up_proj']['dense'].value") == \
        P("fsdp", "tp")
    assert param_spec(vals8, 2, 2, "['down_proj']['dense'].value") == \
        P("tp", "fsdp")
    # bf16 dense unchanged by the dtype probe
    assert param_spec(jnp.zeros((512, 512), jnp.bfloat16), 2, 2,
                      "['q_proj']['dense'].value") == P("tp", "fsdp")
    # scales never take the tp axis themselves (propagation reshards them)
    assert param_spec(jnp.zeros((8, 512), jnp.float32), 2, 2,
                      "['q_proj']['dense_scales'].value") == P()


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_tp_quantized_eval_matches_replicated(tmp_path):
    from sparse_matrix_fine_tuning_tpu.quant import quantize_frozen_base

    mesh = make_mesh(dp=2, fsdp=2, tp=2)
    cfg, model = _flagship()
    n = quantize_frozen_base(model, bits=4)
    assert n > 0
    data = _data(cfg)
    tr_tp = _trainer(tmp_path, model, data, mesh, "tpq")
    # the int4 packed dense landed in-major: tp on dim 1 for col-parallel
    lyr = model.model.layers[0]
    q = lyr.self_attn.q_proj.dense[...]
    assert q.dtype == jnp.uint8
    assert "tp" in str(q.sharding.spec[1])

    cfg2, model2 = _flagship()
    quantize_frozen_base(model2, bits=4)
    tr_plain = _trainer(tmp_path, model2, data, None, "plainq")
    np.testing.assert_allclose(tr_tp.evaluate()["eval_loss"],
                               tr_plain.evaluate()["eval_loss"], rtol=2e-4)


def _flagship(vocab=128, hidden=256, layers=2, heads=4, inter=512):
    cfg = LlamaConfig(
        vocab_size=vocab, hidden_size=hidden, num_hidden_layers=layers,
        num_attention_heads=heads, num_key_value_heads=heads // 2,
        intermediate_size=inter, max_position_embeddings=64,
    )
    model = fresh_model(LlamaForCausalLM, cfg)
    init_monarch(model, {
        "monarch": True, "nblocks": 4, "blk_r": 4, "adapter": True,
        "target_modules": ["q_proj", "v_proj", "k_proj", "o_proj",
                           "gate_proj", "up_proj", "down_proj"],
    }, rngs=nnx.Rngs(1))
    return cfg, model


def _data(cfg, n=16, t=16):
    rng = np.random.default_rng(0)
    ids = rng.integers(2, cfg.vocab_size, size=(n, t))
    return {"input_ids": ids,
            "attention_mask": np.ones_like(ids, dtype=np.int32),
            "labels": ids.copy()}


def _lm_loss(model, batch, train):
    logits = model(batch["input_ids"], attention_mask=batch["attention_mask"])
    # _valid masks eval-batch pad rows (n < per_device_eval_batch_size)
    return model.loss(logits, batch["labels"], weights=batch.get("_valid"))


def _trainer(tmp_path, model, data, mesh, tag):
    args = TrainingArgs(output_dir=str(tmp_path / tag), learning_rate=1e-3,
                        max_steps=2, per_device_train_batch_size=8,
                        logging_steps=0, log_param_steps=0)
    return Trainer(model, args, train_data=data, eval_data=data,
                   loss_fn=_lm_loss, mesh=mesh)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_tp_training_matches_replicated(tmp_path):
    mesh = make_mesh(dp=2, fsdp=2, tp=2)
    cfg, model = _flagship()
    data = _data(cfg)
    tr_tp = _trainer(tmp_path, model, data, mesh, "tp")

    # specs landed: column-parallel out-dim / row-parallel in-dim over tp
    lyr = model.model.layers[0]
    assert "tp" in str(lyr.self_attn.q_proj.dense[...].sharding.spec[0])
    assert "tp" in str(lyr.self_attn.o_proj.dense[...].sharding.spec[1])
    assert "tp" in str(lyr.mlp.down_proj.dense[...].sharding.spec[1])
    # adapters stay replicated
    bd = lyr.self_attn.q_proj.blkdiag1[...]
    assert all(s is None for s in (bd.sharding.spec or [None]))

    cfg2, model2 = _flagship()
    tr_plain = _trainer(tmp_path, model2, data, None, "plain")

    e_tp = tr_tp.evaluate()["eval_loss"]
    e_plain = tr_plain.evaluate()["eval_loss"]
    np.testing.assert_allclose(e_tp, e_plain, rtol=2e-4)

    m_tp = tr_tp.train()
    m_plain = tr_plain.train()
    assert np.isfinite(m_tp["eval_loss"]) and m_tp["eval_loss"] < e_tp
    np.testing.assert_allclose(m_tp["eval_loss"], m_plain["eval_loss"],
                               rtol=5e-4)


@pytest.mark.slow
@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_tp_quantized_training_matches_replicated(tmp_path):
    """The production multi-chip 7B combination: int4 frozen base +
    state_split + ga, TRAINED under a (dp,fsdp,tp) mesh -- loss trajectory
    must match the unsharded run (adapters learn, packed base inert)."""
    from sparse_matrix_fine_tuning_tpu.quant import quantize_frozen_base

    def make(mesh, tag):
        cfg, model = _flagship()
        assert quantize_frozen_base(model, bits=4) > 0
        data = _data(cfg)
        args = TrainingArgs(output_dir=str(tmp_path / tag),
                            learning_rate=1e-3, max_steps=2,
                            per_device_train_batch_size=4,
                            gradient_accumulation_steps=2,
                            state_split=True,
                            logging_steps=0, log_param_steps=0)
        return Trainer(model, args, train_data=data, eval_data=data,
                       loss_fn=_lm_loss, mesh=mesh)

    tr_tp = make(make_mesh(dp=2, fsdp=2, tp=2), "tpq_train")
    tr_plain = make(None, "plainq_train")
    e_tp = tr_tp.evaluate()["eval_loss"]
    np.testing.assert_allclose(e_tp, tr_plain.evaluate()["eval_loss"],
                               rtol=2e-4)
    m_tp = tr_tp.train()
    m_plain = tr_plain.train()
    assert np.isfinite(m_tp["eval_loss"]) and m_tp["eval_loss"] < e_tp
    np.testing.assert_allclose(m_tp["eval_loss"], m_plain["eval_loss"],
                               rtol=5e-4)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_tp_chunked_loss_matches_replicated(tmp_path):
    """Chunked CE (ops/losses.py) under (dp2,fsdp2,tp2): the per-chunk
    head matmul runs with a tp-sharded lm_head kernel and the scan's
    token reshape crosses the dp-sharded batch dim; loss must match the
    unsharded materialised run."""
    import dataclasses

    mesh = make_mesh(dp=2, fsdp=2, tp=2)
    cfg, model = _flagship()
    model.config = dataclasses.replace(model.config, loss_chunk=16)
    data = _data(cfg)
    # default Trainer loss routes through model.training_loss -> chunked
    args = TrainingArgs(output_dir=str(tmp_path / "tp_chunk"),
                        learning_rate=1e-3, max_steps=2,
                        per_device_train_batch_size=8,
                        logging_steps=0, log_param_steps=0)
    tr_tp = Trainer(model, args, train_data=data, eval_data=data, mesh=mesh)

    cfg2, model2 = _flagship()
    tr_plain = _trainer(tmp_path, model2, data, None, "plain_mat")

    e_tp = tr_tp.evaluate()["eval_loss"]
    e_plain = tr_plain.evaluate()["eval_loss"]
    np.testing.assert_allclose(e_tp, e_plain, rtol=2e-4)

    m_tp = tr_tp.train()
    m_plain = tr_plain.train()
    assert np.isfinite(m_tp["eval_loss"]) and m_tp["eval_loss"] < e_tp
    np.testing.assert_allclose(m_tp["eval_loss"], m_plain["eval_loss"],
                               rtol=5e-4)
