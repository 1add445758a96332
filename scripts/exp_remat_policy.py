"""Remat-policy effect on the production trainer step (recipe shape).

Full remat ("nothing" saved) recomputes every layer forward in the
backward -- ~+2N FLOPs/token on a 6N budget.  The "dots" policy
(jax.checkpoint_policies.dots_with_no_batch_dims_saveable) keeps matmul
outputs resident and recomputes only cheap elementwise work, trading
activation memory for most of that recompute.  This measures the bench.py
recipe config (llama 2048h x 8L, bs4 x ga8 x seq512, merged auto) under
all three settings on the real chip.

Run: timeout 2400 python -u scripts/exp_remat_policy.py
"""

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as onp
from flax import nnx

from sparse_matrix_fine_tuning_tpu.models import LlamaConfig, LlamaForCausalLM
from sparse_matrix_fine_tuning_tpu.peft import init_monarch
from sparse_matrix_fine_tuning_tpu.training import Trainer, TrainingArgs

BS, GA, T = 4, 8, 512


def measure(remat: bool, policy: str) -> dict:
    cfg = LlamaConfig(hidden_size=2048, num_hidden_layers=8,
                      num_attention_heads=16, num_key_value_heads=16,
                      intermediate_size=5504, vocab_size=32000,
                      param_dtype="bfloat16", dtype="bfloat16",
                      remat=remat, remat_policy=policy,
                      max_position_embeddings=T)
    rng = onp.random.default_rng(0)
    ids = rng.integers(2, cfg.vocab_size, size=(BS * GA * 2, T)).astype(onp.int32)
    data = {"input_ids": ids, "attention_mask": onp.ones_like(ids),
            "labels": ids}

    def lm_loss(model, batch, train):
        logits = model(batch["input_ids"],
                       attention_mask=batch["attention_mask"])
        return model.loss(logits, batch["labels"], weights=batch.get("_valid"))

    model = LlamaForCausalLM(cfg, rngs=nnx.Rngs(0))
    init_monarch(model, {
        "monarch": True, "nblocks": 4, "blk_r": 4, "adapter": True,
        "target_modules": ["q_proj", "v_proj", "k_proj", "o_proj",
                           "gate_proj", "up_proj", "down_proj"]},
        rngs=nnx.Rngs(1))
    targs = TrainingArgs(output_dir="/tmp/exp_remat", learning_rate=5e-4,
                         max_steps=10**9, per_device_train_batch_size=BS,
                         gradient_accumulation_steps=GA, logging_steps=0,
                         log_param_steps=0, merged_training="auto")
    tr = Trainer(model, targs, train_data=data, loss_fn=lm_loss)
    tr.model.train()
    batches = [b for b, _ in tr._batches(data, BS, shuffle=False, accum=GA)]
    for _ in range(3):
        float(tr._train_step_accum(tr.model, tr.optimizer, batches[0]))
    times = []
    for i in range(8):
        t0 = time.time()
        float(tr._train_step_accum(tr.model, tr.optimizer,
                                   batches[i % len(batches)]))
        times.append(time.time() - t0)
    ms = statistics.median(times) * 1e3
    return {"remat": remat, "policy": policy, "ms_per_opt_step": round(ms, 1),
            "tokens_per_s": round(BS * GA * T / (ms / 1e3))}


def main():
    for remat, policy in ((True, "nothing"), (True, "dots"), (False, "nothing")):
        try:
            rec = measure(remat, policy)
        except Exception as e:  # noqa: BLE001 -- e.g. no-remat may OOM
            rec = {"remat": remat, "policy": policy,
                   "error": f"{type(e).__name__}: {str(e)[:150]}"}
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
