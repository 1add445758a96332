"""Production-path trainer step: merged-training vs standard, real chip.

Times Trainer optimizer steps (the actual train_step_accum dispatch, incl.
data transfer) for a mid-size Llama at a reasoning-style recipe
(bs x ga micro-batches per step).  Wall-clock per optimizer step, fetching
the loss each step to force sequential execution through the tunnel.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from sparse_matrix_fine_tuning_tpu.models import LlamaConfig, LlamaForCausalLM
from sparse_matrix_fine_tuning_tpu.peft import init_monarch
from sparse_matrix_fine_tuning_tpu.training import Trainer, TrainingArgs

print("backend:", jax.default_backend(), flush=True)

BS, GA, T = 4, 8, 512
cfg = LlamaConfig(hidden_size=2048, num_hidden_layers=8,
                  num_attention_heads=16, num_key_value_heads=16,
                  intermediate_size=5504, vocab_size=32000,
                  param_dtype="bfloat16", dtype="bfloat16", remat=True,
                  max_position_embeddings=T)
rng = np.random.default_rng(0)
n = BS * GA * 4
ids = rng.integers(2, cfg.vocab_size, size=(n, T))
data = {"input_ids": ids.astype(np.int32),
        "attention_mask": np.ones_like(ids, np.int32),
        "labels": ids.astype(np.int32)}


def lm_loss(model, batch, train):
    logits = model(batch["input_ids"], attention_mask=batch["attention_mask"])
    return model.loss(logits, batch["labels"], weights=batch.get("_valid"))


for mode in ("off", "auto"):
    model = LlamaForCausalLM(cfg, rngs=nnx.Rngs(0))
    init_monarch(model, {
        "monarch": True, "nblocks": 4, "blk_r": 4, "adapter": True,
        "target_modules": ["q_proj", "v_proj", "k_proj", "o_proj",
                           "gate_proj", "up_proj", "down_proj"]},
        rngs=nnx.Rngs(1))
    args = TrainingArgs(output_dir="/tmp/bench_trainer", learning_rate=5e-4,
                        max_steps=10**9, per_device_train_batch_size=BS,
                        gradient_accumulation_steps=GA, logging_steps=0,
                        log_param_steps=0, merged_training=mode)
    tr = Trainer(model, args, train_data=data, loss_fn=lm_loss)
    tr.model.train()
    batches = list(tr._batches(data, BS, shuffle=False, accum=GA))
    step_fn = tr._train_step_accum
    # warmup: compile + the tunnel's slow first-execution finalization
    for _ in range(3):
        loss = float(step_fn(tr.model, tr.optimizer, batches[0][0]))
    import statistics
    times = []
    N = 8
    for i in range(N):
        t0 = time.time()
        loss = float(step_fn(tr.model, tr.optimizer, batches[i % len(batches)][0]))
        times.append(time.time() - t0)
    dt = statistics.median(times)
    toks = BS * GA * T / dt
    print(f"merged={mode:4s} (n_merged={tr._n_merged}): "
          f"{dt*1e3:7.1f} ms/opt-step ({toks:,.0f} tokens/s) loss={loss:.3f}",
          flush=True)
