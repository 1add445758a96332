"""Flagship SERVING measurement: full Llama-2-7B greedy decode on ONE v5e
chip with an int4 host-quantized base (+ optional w8a8 int8 lm_head) and
unmerged Monarch adapters -- the committed evidence behind "the 7B trains
AND SERVES on one 16 GB chip" (docs/BENCHMARKS.md decode section).

Same host-quantize-then-ship build as the training flagship
(scripts/exp_7b_execution.py QUANT_HOST=1): the device never holds the
13 GB bf16 init transient, only the ~3.4 GB packed weights.  Slope-timed
(N vs 3N new tokens, fresh prompts) like scripts/bench_decode_bits.py.

Run: timeout 3600 python -u scripts/bench_7b_decode.py
Appends rows to results/decode_7b.json.
"""
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from sparse_matrix_fine_tuning_tpu.models import LlamaConfig, LlamaForCausalLM
from sparse_matrix_fine_tuning_tpu.models.generate import (
    GenerationConfig, generate)
from sparse_matrix_fine_tuning_tpu.peft import init_monarch
from sparse_matrix_fine_tuning_tpu.quant import (
    quantize_frozen_base, quantize_lm_head)

B, NEW, PROMPT = 4, 64, 32


def measure(bits: int, head: str | bool, requant_merge: bool = False):
    cfg = LlamaConfig(
        vocab_size=32000, hidden_size=4096, num_hidden_layers=32,
        num_attention_heads=32, num_key_value_heads=32,
        intermediate_size=11008, param_dtype="bfloat16", dtype="bfloat16",
        max_position_embeddings=PROMPT + 3 * NEW)
    t0 = time.time()
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        model = LlamaForCausalLM(cfg, rngs=nnx.Rngs(0))
        init_monarch(model, {
            "monarch": True, "nblocks": 4, "blk_r": 4, "adapter": True,
            "target_modules": ["q_proj", "v_proj", "k_proj", "o_proj",
                               "gate_proj", "up_proj", "down_proj"]},
            rngs=nnx.Rngs(1))
        nq = quantize_frozen_base(model, bits=bits)
        if requant_merge:
            # serving-only lossy merge: sheds the 7 x 32 per-step adapter
            # ops (quant.requantize_merge_adapters)
            from sparse_matrix_fine_tuning_tpu.quant import (
                requantize_merge_adapters)
            assert requantize_merge_adapters(model) == nq
        if head:
            assert quantize_lm_head(model, impl=head)
    tpu = jax.devices()[0]
    state = jax.device_put(nnx.state(model), tpu)
    nnx.update(model, state)
    model.eval()
    print(f"[7b-decode] int{bits} x{nq} head={head}: host-quantized + "
          f"shipped in {time.time()-t0:.0f}s", flush=True)

    mask = jnp.ones((B, PROMPT), jnp.int32)
    rng = np.random.default_rng(0)

    def fresh():
        return jnp.asarray(rng.integers(2, cfg.vocab_size, (B, PROMPT)),
                           jnp.int32)

    def one_round():
        lo = GenerationConfig(max_new_tokens=NEW, eos_token_id=None)
        hi = GenerationConfig(max_new_tokens=3 * NEW, eos_token_id=None)
        np.asarray(generate(model, fresh(), mask, lo))
        np.asarray(generate(model, fresh(), mask, hi))
        t0 = time.perf_counter()
        np.asarray(generate(model, fresh(), mask, lo))
        t_lo = time.perf_counter() - t0
        t0 = time.perf_counter()
        np.asarray(generate(model, fresh(), mask, hi))
        t_hi = time.perf_counter() - t0
        return (t_hi - t_lo) / (2 * NEW)

    per_tok = statistics.median(one_round() for _ in range(3))
    # weight-read floor per decode step at the quantized widths
    p_proj = 32 * (4 * 4096 * 4096 + 3 * 4096 * 11008)
    p_head = 32000 * 4096
    floor_s = (p_proj * {8: 1, 4: 0.5}[bits]
               + p_head * (1 if head else 2)) / 819e9
    return {"bits": bits, "quant_lm_head": head,
            "requant_merge": requant_merge,
            "ms_per_decode_step": round(per_tok * 1e3, 3),
            "tokens_per_s": round(B / per_tok),
            "pct_of_weight_roofline": round(floor_s / per_tok * 100, 1),
            "batch": B}


def main():
    out = []
    for bits, head, merge in ((4, False, False), (4, "w8a8", False),
                              (4, "w8a8", True)):
        try:
            rec = measure(bits, head, merge)
        except Exception as e:  # noqa: BLE001 -- report per-config
            rec = {"bits": bits, "quant_lm_head": head,
                   "requant_merge": merge,
                   "error": f"{type(e).__name__}: {str(e)[:200]}"}
        print(json.dumps(rec), flush=True)
        out.append(rec)
    os.makedirs("results", exist_ok=True)
    with open("results/decode_7b.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
