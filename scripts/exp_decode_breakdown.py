"""[EXPERIMENT -- on-chip] Where does the int4 decode step's time go?

results/decode_bits.json has int4 at 2.498 ms/step vs int8 at 2.364 --
yet the fused int4 kernel beats the int8 kernel per layer (half the
packed bytes; scripts/exp_int4_dequant_variants.py measured the
production unpack fastest of five arithmetic variants and ~2x the DMA
floor, which the int8 kernel's own dequant overhead roughly matches).
Hypothesis: the gap is CONFIG overhead, not kernel -- a quantized base
cannot absorb the bf16 adapter delta (layers/monarch_linear.py merge
guard), so the quant rows pay 7 x 22 = 154 unmerged Monarch adapter ops
per decode step that the bf16 row (merged at eval) does not, plus the
bf16 lm_head read.

This script slope-times greedy decode (batch 4, TinyLlama-1.1B shape) at
ablation points that isolate each term:

  bf16 merged          -- baseline (adapters folded into dense)
  int4 + adapters      -- the committed decode_bits row
  int4 no-adapters     -- same minus the 154 adapter ops
  int4 no-ad + w8a8    -- plus int8-MXU lm_head
  int8 no-adapters     -- int8 comparison at the same config

Run on TPU:  timeout 3000 python -u scripts/exp_decode_breakdown.py
"""
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax.numpy as jnp
from flax import nnx

from sparse_matrix_fine_tuning_tpu.models import LlamaConfig, LlamaForCausalLM
from sparse_matrix_fine_tuning_tpu.models.generate import (
    GenerationConfig, generate)
from sparse_matrix_fine_tuning_tpu.peft import init_monarch
from sparse_matrix_fine_tuning_tpu.quant import (
    quantize_frozen_base, quantize_lm_head)

B, NEW, PROMPT = 4, 128, 64


def measure(label, bits, adapters, qlm):
    cfg = LlamaConfig(
        vocab_size=32000, hidden_size=2048, num_hidden_layers=22,
        num_attention_heads=32, num_key_value_heads=4,
        intermediate_size=5632, param_dtype="bfloat16", dtype="bfloat16",
        max_position_embeddings=PROMPT + 3 * NEW)
    model = LlamaForCausalLM(cfg, rngs=nnx.Rngs(0))
    if adapters:
        init_monarch(model, {
            "monarch": True, "nblocks": 4, "blk_r": 4, "adapter": True,
            "target_modules": ["q_proj", "v_proj", "k_proj", "o_proj",
                               "gate_proj", "up_proj", "down_proj"]},
            rngs=nnx.Rngs(1))
    elif bits:
        # quantize_frozen_base only touches MonarchLinear layers: surgery
        # with an all-zero (lora_style) adapter whose ops we then disable
        # is NOT what we want -- instead run surgery and hard-disable the
        # adapter branch so only the quantized dense dot remains.
        init_monarch(model, {
            "monarch": True, "nblocks": 4, "blk_r": 4, "adapter": True,
            "target_modules": ["q_proj", "v_proj", "k_proj", "o_proj",
                               "gate_proj", "up_proj", "down_proj"]},
            rngs=nnx.Rngs(1))
    if bits:
        quantize_frozen_base(model, bits=bits)
    if not adapters and bits:
        # ablation: pretend the adapter is merged so __call__ skips the
        # monarch branch and only the quantized dense dot remains
        from sparse_matrix_fine_tuning_tpu.layers.monarch_linear import (
            MonarchLinear)
        from sparse_matrix_fine_tuning_tpu.peft.surgery import _iter_parents
        for _, _, mod in _iter_parents(model):
            if isinstance(mod, MonarchLinear):
                mod.merged = True
    if qlm:
        assert quantize_lm_head(model, impl=qlm)
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
    print(f"{label:22s} {per_tok * 1e3:7.3f} ms/step "
          f"{B / per_tok:7.0f} tok/s", flush=True)
    return per_tok


def main():
    measure("bf16 merged", 0, True, False)
    measure("int4 + adapters", 4, True, False)
    measure("int4 no-adapters", 4, False, False)
    measure("int4 no-ad + w8a8", 4, False, "w8a8")
    measure("int8 no-adapters", 8, False, False)
    measure("int8 no-ad + w8a8", 8, False, "w8a8")


if __name__ == "__main__":
    main()
