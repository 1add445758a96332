"""Sequence parallelism (parallel/annotate.py): SP layout + loss parity.

Megatron-style SP rides the tp mesh axis: residual-stream activations are
sharded (batch, seq/tp, hidden) between the tensor-parallel matmuls.  The
reference is single-GPU (SURVEY.md section 2.6); SP is part of this repo's
native scaling story.  Verified on the virtual 8-device CPU mesh: the
constraint lands the documented layout, is a no-op where it must be, and
an SP-on training run matches SP-off and unsharded runs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx
from jax.sharding import PartitionSpec as P

from sparse_matrix_fine_tuning_tpu.models import LlamaConfig, LlamaForCausalLM
from sparse_matrix_fine_tuning_tpu.parallel import make_mesh
from sparse_matrix_fine_tuning_tpu.parallel.annotate import (
    activation_mesh,
    get_activation_mesh,
    shard_tokens,
)
from sparse_matrix_fine_tuning_tpu.peft import init_monarch
from sparse_matrix_fine_tuning_tpu.training import Trainer, TrainingArgs
from sparse_matrix_fine_tuning_tpu.utils.testing import fresh_model

needs_mesh = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def test_shard_tokens_noop_without_mesh():
    x = jnp.ones((2, 8, 4))
    assert shard_tokens(x) is x
    assert get_activation_mesh() is None


@needs_mesh
def test_shard_tokens_layout_and_guards():
    mesh = make_mesh(dp=2, fsdp=2, tp=2)
    with activation_mesh(mesh):
        # (batch % dp*fsdp == 0, seq % tp == 0): full SP layout
        y = jax.jit(shard_tokens)(jnp.ones((8, 16, 4)))
        assert y.sharding.spec == P(("dp", "fsdp"), "tp")
        # seq indivisible by tp: no constraint (decode steps have seq 1)
        x = jnp.ones((8, 7, 4))
        assert shard_tokens(x) is x
        # batch indivisible by the data axes: seq still shards, batch doesn't
        y = jax.jit(shard_tokens)(jnp.ones((3, 16, 4)))
        assert y.sharding.spec == P(None, "tp")
        # non-3D (e.g. logits already flattened): untouched
        x2 = jnp.ones((8, 16))
        assert shard_tokens(x2) is x2
    # context restored
    assert get_activation_mesh() is None
    x = jnp.ones((8, 16, 4))
    assert shard_tokens(x) is x

    # tp=1 mesh: nothing to ride, no-op
    mesh1 = make_mesh(dp=2, fsdp=4, tp=1)
    with activation_mesh(mesh1):
        assert shard_tokens(x) is x


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
    return model.loss(logits, batch["labels"])


def _trainer(tmp_path, model, data, mesh, tag, sp):
    args = TrainingArgs(output_dir=str(tmp_path / tag), learning_rate=1e-3,
                        max_steps=2, per_device_train_batch_size=8,
                        logging_steps=0, log_param_steps=0,
                        sequence_parallel=sp)
    return Trainer(model, args, train_data=data, eval_data=data,
                   loss_fn=_lm_loss, mesh=mesh)


@needs_mesh
def test_sp_on_off_losses_match(tmp_path):
    """SP only re-lays-out activations: eval + 2-step train losses must
    match the same mesh without SP and the unsharded run."""
    mesh = make_mesh(dp=2, fsdp=2, tp=2)
    data = _data(_flagship()[0])

    runs = {}
    for tag, m, sp in (("sp", mesh, "on"), ("tp", mesh, "off"),
                       ("plain", None, "off")):
        _, model = _flagship()
        tr = _trainer(tmp_path, model, data, m, tag, sp)
        runs[tag] = (tr.evaluate()["eval_loss"], tr.train()["eval_loss"])

    e_sp, t_sp = runs["sp"]
    assert np.isfinite(t_sp) and t_sp < e_sp
    np.testing.assert_allclose(e_sp, runs["tp"][0], rtol=2e-4)
    np.testing.assert_allclose(t_sp, runs["tp"][1], rtol=5e-4)
    np.testing.assert_allclose(e_sp, runs["plain"][0], rtol=2e-4)
    np.testing.assert_allclose(t_sp, runs["plain"][1], rtol=5e-4)
    # the trace-scoped context never leaks out of the trainer
    assert get_activation_mesh() is None
