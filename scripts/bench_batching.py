"""Batching-strategy throughput: plain vs group_by_length vs packing.

The reference relies on HF's LengthGroupedSampler (qlora_monarch.py:537-544)
to co-batch similar lengths; padding still goes to the batch max.  This
repo offers two TPU-native upgrades (one epoch over a ragged
instruction-tuning-shaped dataset, same true tokens each way):

  * group_by_length (training/trainer.py): grouping + TRIMS each batch's
    time axis to a bucketed max -- a handful of static shapes.
  * sequence packing (data/alpaca.pack_causal_lm + models/llama.py
    segment_ids): bin-packs examples into full rows with block-diagonal
    attention masking and per-segment RoPE restarts; one static shape,
    near-zero padding.

Run: timeout 1800 python -u scripts/bench_batching.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np
from flax import nnx

from sparse_matrix_fine_tuning_tpu.models import LlamaConfig, LlamaForCausalLM
from sparse_matrix_fine_tuning_tpu.peft import init_monarch
from sparse_matrix_fine_tuning_tpu.training import Trainer, TrainingArgs

print("backend:", jax.default_backend(), flush=True)

cfg = LlamaConfig(vocab_size=2048, hidden_size=1024, num_hidden_layers=8,
                  num_attention_heads=8, num_key_value_heads=4,
                  intermediate_size=2816, max_position_embeddings=1024,
                  param_dtype="bfloat16", dtype="bfloat16")

N, T, BS = 512, 1024, 8
rng = np.random.default_rng(0)
ids = rng.integers(2, cfg.vocab_size, size=(N, T)).astype(np.int32)
mask = np.zeros((N, T), np.int32)
# alpaca-like length mix: mostly short prompts, a long tail
lens = np.clip((rng.lognormal(mean=5.0, sigma=0.7, size=N)).astype(int), 32, T)
for i, L in enumerate(lens):
    mask[i, :L] = 1
    ids[i, L:] = 0
labels = np.where(mask > 0, ids, -100)
data = {"input_ids": ids, "attention_mask": mask, "labels": labels}
print(f"rows {N}, T {T}, mean len {lens.mean():.0f}, p90 {np.percentile(lens, 90):.0f}",
      flush=True)


def lm_loss(model, batch, train):
    logits = model(batch["input_ids"], attention_mask=batch["attention_mask"],
                   segment_ids=batch.get("segment_ids"))
    return model.loss(logits, batch["labels"], weights=batch.get("_valid"))


def pack_rows():
    """Bin-pack the same true tokens via the production packer."""
    from sparse_matrix_fine_tuning_tpu.data.alpaca import pack_tokenized
    packed, _ = pack_tokenized(data, T)
    return packed


def run(group: bool, use_data=None) -> float:
    model = LlamaForCausalLM(cfg, rngs=nnx.Rngs(0))
    init_monarch(model, {"monarch": True, "nblocks": 4, "blk_r": 4,
                         "adapter": True,
                         "target_modules": ["q_proj", "v_proj", "k_proj",
                                            "o_proj", "gate_proj", "up_proj",
                                            "down_proj"]},
                 rngs=nnx.Rngs(1))
    d = data if use_data is None else use_data
    args = TrainingArgs(output_dir=f"/tmp/gbl_{group}", learning_rate=5e-4,
                        num_train_epochs=1, per_device_train_batch_size=BS,
                        logging_steps=0, log_param_steps=0, save_steps=0,
                        group_by_length=group, length_bucket=128)
    t = Trainer(model, args, train_data=d, loss_fn=lm_loss)
    t.model.train()
    # warmup epoch with the SAME shuffle seed as the timed one: identical
    # batch composition, so every bucket shape compiles before timing.
    # block_until_ready per step in BOTH epochs: async dispatch through the
    # sandbox tunnel both elides repeated identical executions (faking the
    # single-shape ungrouped run fast) and, conversely, pathologically
    # serializes mixed-executable queues (faking the grouped run slow) --
    # measured: identical grouped epochs read 354s unsynced vs 5.2s synced
    for batch, _ in t._batches(d, BS, shuffle=True, seed=2):
        t._train_step(t.model, t.optimizer, batch).block_until_ready()
    t0 = time.time()
    for batch, _ in t._batches(d, BS, shuffle=True, seed=2):
        t._train_step(t.model, t.optimizer, batch).block_until_ready()
    return time.time() - t0


packed_data = pack_rows()
n_packed = len(packed_data["input_ids"])
print(f"packed: {N} examples -> {n_packed} rows "
      f"({mask.sum() / (n_packed * T):.0%} token efficiency)", flush=True)
t_grouped = run(True)
t_plain = run(False)
t_packed = run(False, use_data=packed_data)
toks = int(mask.sum())
print(f"ungrouped epoch: {t_plain:.2f}s  ({toks / t_plain:.0f} true-tokens/s)",
      flush=True)
print(f"grouped epoch:   {t_grouped:.2f}s  ({toks / t_grouped:.0f} true-tokens/s)"
      f"  -> {t_plain / t_grouped:.2f}x", flush=True)
print(f"packed epoch:    {t_packed:.2f}s  ({toks / t_packed:.0f} true-tokens/s)"
      f"  -> {t_plain / t_packed:.2f}x", flush=True)
