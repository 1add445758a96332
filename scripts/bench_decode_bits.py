"""Serving decode tokens/s vs base precision: bf16 / int8 / int4 frozen
base + unmerged Monarch adapters at the TinyLlama-1.1B shape (batch 4,
greedy).  Slope-timed (N vs 3N new tokens with fresh prompts) to cancel
prefill + dispatch.  Emits one JSON line per precision; the int8 row is
also driver-captured every round by bench.py.

Run: timeout 3000 python -u scripts/bench_decode_bits.py
"""
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax.numpy as jnp
from flax import nnx

from sparse_matrix_fine_tuning_tpu.models import LlamaConfig, LlamaForCausalLM
from sparse_matrix_fine_tuning_tpu.models.generate import GenerationConfig, generate
from sparse_matrix_fine_tuning_tpu.peft import init_monarch
from sparse_matrix_fine_tuning_tpu.quant import quantize_frozen_base

B, NEW, PROMPT = 4, 128, 64


def measure(bits, quant_lm_head=False, requant_merge=False, w8a8_proj=False):
    cfg = LlamaConfig(
        vocab_size=32000, hidden_size=2048, num_hidden_layers=22,
        num_attention_heads=32, num_key_value_heads=4,
        intermediate_size=5632, param_dtype="bfloat16", dtype="bfloat16",
        max_position_embeddings=PROMPT + 3 * NEW)
    model = LlamaForCausalLM(cfg, rngs=nnx.Rngs(0))
    init_monarch(model, {
        "monarch": True, "nblocks": 4, "blk_r": 4, "adapter": True,
        "target_modules": ["q_proj", "v_proj", "k_proj", "o_proj",
                           "gate_proj", "up_proj", "down_proj"]},
        rngs=nnx.Rngs(1))
    if bits:
        quantize_frozen_base(model, bits=bits)
    if requant_merge:
        # serving-only lossy merge: fold the adapter delta into the int
        # codes (quant.requantize_merge_adapters) so the quant config
        # sheds the 7 x 22 per-step adapter ops the bf16 config merges
        # away exactly
        from sparse_matrix_fine_tuning_tpu.quant import (
            requantize_merge_adapters)
        assert requantize_merge_adapters(model) > 0
    if w8a8_proj:
        # serving-only w8a8 projections: per-token activation quant +
        # int8 MXU dots, zero weight-dequant VPU work
        from sparse_matrix_fine_tuning_tpu.quant import enable_w8a8_serving
        assert enable_w8a8_serving(model) > 0
    if quant_lm_head:
        from sparse_matrix_fine_tuning_tpu.quant import quantize_lm_head
        assert quantize_lm_head(model, impl=quant_lm_head)
    model.eval()
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
    # weight-traffic roofline: every decode step reads the full frozen
    # base (+ adapters, negligible) once from HBM.  Per-matrix widths:
    # projections at `bits`, lm_head bf16 unless quant_lm_head (then
    # int8), embedding gather is B rows -- negligible, excluded.
    p_proj = cfg.num_hidden_layers * (
        cfg.hidden_size * (cfg.num_attention_heads
                           + 2 * (cfg.num_key_value_heads or 32)) *
        (cfg.hidden_size // cfg.num_attention_heads)
        + cfg.hidden_size * cfg.hidden_size
        + 3 * cfg.hidden_size * cfg.intermediate_size)
    p_head = cfg.vocab_size * cfg.hidden_size
    bytes_per_w = {0: 2, 8: 1, 4: 0.5}[bits]
    floor_s = (p_proj * bytes_per_w
               + p_head * (1 if quant_lm_head else 2)) / 819e9
    return {"bits": bits or 16, "quant_lm_head": quant_lm_head,
            "requant_merge": requant_merge, "w8a8_proj": w8a8_proj,
            "ms_per_decode_step": round(per_tok * 1e3, 3),
            "tokens_per_s": round(B / per_tok),
            "pct_of_weight_roofline": round(floor_s / per_tok * 100, 1)}


def main():
    out = []
    for bits, qlm, merge, w8a8 in (
            (0, False, False, False), (8, False, False, False),
            (8, "dequant", False, False), (8, "w8a8", False, False),
            (4, False, False, False), (4, "w8a8", False, False),
            (8, "w8a8", True, False), (4, "w8a8", True, False),
            (8, "w8a8", True, True)):
        try:
            rec = measure(bits, qlm, merge, w8a8)
        except Exception as e:  # noqa: BLE001
            rec = {"bits": bits or 16, "quant_lm_head": qlm,
                   "requant_merge": merge, "w8a8_proj": w8a8,
                   "error": f"{type(e).__name__}: {str(e)[:160]}"}
        print(json.dumps(rec), flush=True)
        out.append(rec)
    os.makedirs("results", exist_ok=True)
    with open("results/decode_bits.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
