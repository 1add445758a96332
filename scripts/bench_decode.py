"""Decode throughput on the real chip: greedy and beam-4 tokens/s.

The reference's reasoning evals are generation-bound (beam 4, up to 512
new tokens over 7 math datasets -- compute_metrics.py:158-187); this
repo's decode is a single jitted lax.while_loop dispatch with a
fixed-size KV cache (models/generate.py).  Timing: one call generating N
tokens vs one generating 3N -- per-token time is the SLOPE, which cancels
prefill, dispatch, and tunnel overheads (utils/benchlib rationale).
EOS is disabled so the token counts are exact.

Model: TinyLlama-1.1B-shaped (hidden 2048, 22 layers, GQA 4 kv heads)
with Monarch adapters on all seven projections -- the PEFT-serving shape.
Decode is HBM-bound: the floor is (param bytes)/(bandwidth) per token.

Run (options are ENV VARS; defaults B=4, NEW=128, BITS=16 bf16-merged):

    B=8 NEW=128 BITS=8 timeout 1800 python -u scripts/bench_decode.py

BITS=8/4 quantizes the frozen base on device instead of merging (a
quantized dense cannot absorb the adapter); the decode then reads int8
weights + the tiny monarch factors per token -- the HBM floor halves.
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
from sparse_matrix_fine_tuning_tpu.models.generate import (
    GenerationConfig, beam_generate, generate)
from sparse_matrix_fine_tuning_tpu.peft import init_monarch, merge_all_adapters

print("backend:", jax.default_backend(), flush=True)
B = int(os.environ.get("B", 4))
NEW = int(os.environ.get("NEW", 128))
PROMPT = 64

cfg = LlamaConfig(
    vocab_size=32000, hidden_size=2048, num_hidden_layers=22,
    num_attention_heads=32, num_key_value_heads=4, intermediate_size=5632,
    param_dtype="bfloat16", dtype="bfloat16",
    max_position_embeddings=PROMPT + 3 * NEW,
)
t0 = time.time()
model = LlamaForCausalLM(cfg, rngs=nnx.Rngs(0))
init_monarch(model, {"monarch": True, "nblocks": 4, "blk_r": 4,
                     "adapter": True,
                     "target_modules": ["q_proj", "v_proj", "k_proj",
                                        "o_proj", "gate_proj", "up_proj",
                                        "down_proj"]},
             rngs=nnx.Rngs(1))
BITS = int(os.environ.get("BITS", 16))
if BITS in (4, 8):
    from sparse_matrix_fine_tuning_tpu.quant import quantize_frozen_base
    nq = quantize_frozen_base(model, bits=BITS)
    print(f"quantized {nq} base matrices to int{BITS}", flush=True)
else:
    # serving path: adapters merged into the dense (reference merges at
    # eval, monarch_linear.py:255-276) -- decode reads ONE operand per layer
    merge_all_adapters(model)
model.eval()
state = nnx.state(model)
nbytes = sum(v.nbytes for v in jax.tree.leaves(state)
             if hasattr(v, "nbytes"))
nparams = sum(int(np.prod(v.shape)) for v in
              jax.tree.leaves(nnx.state(model, nnx.Param)))
print(f"init {nparams/1e9:.2f}B params ({nbytes/1e9:.2f} GB): "
      f"{time.time()-t0:.1f}s", flush=True)

rng = np.random.default_rng(0)
mask = jnp.ones((B, PROMPT), jnp.int32)


def fresh_ids():
    # DISTINCT prompt per call: the tunnel elides repeated identical
    # executions (utils/benchlib rationale), so identical-args timing lies
    return jnp.asarray(rng.integers(2, cfg.vocab_size, (B, PROMPT)),
                       jnp.int32)


def tok_s(fn, n_lo):
    gc_lo = GenerationConfig(max_new_tokens=n_lo, eos_token_id=None,
                             num_beams=4 if fn is beam_generate else 1)
    gc_hi = GenerationConfig(max_new_tokens=3 * n_lo, eos_token_id=None,
                             num_beams=4 if fn is beam_generate else 1)
    np.asarray(fn(model, fresh_ids(), mask, gc_lo))   # compile + warm
    np.asarray(fn(model, fresh_ids(), mask, gc_hi))
    t0 = time.perf_counter()
    np.asarray(fn(model, fresh_ids(), mask, gc_lo))
    t_lo = time.perf_counter() - t0
    t0 = time.perf_counter()
    np.asarray(fn(model, fresh_ids(), mask, gc_hi))
    t_hi = time.perf_counter() - t0
    per_tok = (t_hi - t_lo) / (2 * n_lo)
    return per_tok


floor_ms = nbytes / 8.1e11 * 1e3
for label, fn in (("greedy", generate), ("beam4", beam_generate)):
    ts = [tok_s(fn, NEW) for _ in range(3)]
    per = float(np.median(ts))
    print(f"{label:6s} decode: {per*1e3:6.2f} ms/step "
          f"({B/per:7.1f} tokens/s at batch {B}; "
          f"HBM floor ~{floor_ms:.2f} ms/step)", flush=True)
