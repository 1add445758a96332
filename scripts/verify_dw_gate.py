"""Real-chip drive of the per-runtime dw-kernel gate (kernels/runtime_gate).

Resolves the gate on this runtime (running the timing probe unless
SMFT_PALLAS_DW forces it), prints the decision and the probe cache path,
then runs two merged-training optimizer steps through Trainer with
merged_training="on" so the selected dw implementation executes inside the
production jitted scan.  Losses must be finite and decreasing-ish.

Run: timeout 1800 python -u scripts/verify_dw_gate.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np
from flax import nnx

from sparse_matrix_fine_tuning_tpu.kernels import runtime_gate

print("backend:", jax.default_backend(), flush=True)
t0 = time.time()
decision = runtime_gate.use_fused_dw()
print(f"gate decision: fused_dw={decision} "
      f"(env={os.environ.get('SMFT_PALLAS_DW', 'auto')!r}, "
      f"cache={runtime_gate._cache_path()}, resolve {time.time()-t0:.1f}s)",
      flush=True)

from sparse_matrix_fine_tuning_tpu.models import (  # noqa: E402
    RobertaConfig, RobertaForSequenceClassification)
from sparse_matrix_fine_tuning_tpu.peft import init_monarch  # noqa: E402
from sparse_matrix_fine_tuning_tpu.training import (  # noqa: E402
    Trainer, TrainingArgs)

cfg = RobertaConfig.tiny()
model = RobertaForSequenceClassification(cfg, rngs=nnx.Rngs(0))
init_monarch(model, {"monarch": True, "nblocks": 4, "blk_r": 4,
                     "adapter": True,
                     "target_modules": ["query", "value"]},
             rngs=nnx.Rngs(1))
rng = np.random.default_rng(0)
n = 64
data = {"input_ids": rng.integers(2, cfg.vocab_size, size=(n, 12)),
        "attention_mask": np.ones((n, 12), np.int32),
        "labels": (rng.integers(0, 2, size=(n,))).astype(np.int32)}
args = TrainingArgs(output_dir="/tmp/verify_dw_gate", learning_rate=5e-3,
                    max_steps=2, per_device_train_batch_size=8,
                    gradient_accumulation_steps=4, merged_training="on",
                    logging_steps=0, log_param_steps=0)
tr = Trainer(model, args, train_data=data)
assert tr._n_merged > 0, "merged training must be on for this drive"
batches = [b for b, _ in tr._batches(data, 8, shuffle=False, accum=4)]
losses = []
for i in range(2):
    t0 = time.time()
    losses.append(float(tr._train_step_accum(tr.model, tr.optimizer,
                                             batches[i % len(batches)])))
    print(f"step {i}: loss {losses[-1]:.4f} ({time.time()-t0:.1f}s)",
          flush=True)
assert all(np.isfinite(losses)), losses
print(f"OK: merged-training steps executed with fused_dw={decision}",
      flush=True)
