"""Realistic generation-eval benchmark: the loreft math-eval loop shape
on the real chip (VERDICT r4 #5).

The reference's reasoning evaluation decodes with HF generate -- beam 4,
prompts around 666 tokens (f7+l7 position parsing assumes long few-shot
prompts), 32 new tokens for the single-answer math datasets, across 7
datasets (reference pyreft/loreft/compute_metrics.py:158-187).  SURVEY
section 7 lists this as a hard part for a from-scratch stack: prefill +
fixed-KV beam decode as ONE jitted dispatch, reused across batches.

This bench runs that loop at a 1.1B-parameter TinyLlama shape with Monarch
adapters merged for serving, measuring WHOLE eval calls (prefill included
-- eval wall-clock is what a user pays, so no slope trick here; fresh
prompts per call defeat the tunnel's identical-call elision):

  - greedy and beam-4, batch 8, prompt 666, 32 new tokens;
  - the ReFT-intervened variant (LoreftIntervention at f7+l7 prompt
    positions through ReftModel, the loreft eval configuration) for the
    greedy path -- intervention_locations ride the compiled decode.

Reports ms/batch, examples/s, wall-clock per 1k examples, and the
extrapolated 7-dataset wall-clock at the reference's eval sizes.
Writes results/reasoning_eval_bench.json (bench.py carries the row).

Run: timeout 2400 python -u scripts/bench_reasoning_eval.py
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
from sparse_matrix_fine_tuning_tpu.peft import init_monarch, merge_all_adapters

B = int(os.environ.get("B", 8))
PROMPT = int(os.environ.get("PROMPT", 666))
NEW = int(os.environ.get("NEW", 32))
ROUNDS = int(os.environ.get("ROUNDS", 5))
# reference 7-dataset math eval sizes (loreft dataset.py test splits)
MATH_EVAL_EXAMPLES = {
    "AQuA": 254, "gsm8k": 1319, "SVAMP": 300, "mawps": 238,
    "AddSub": 395, "MultiArith": 600, "SingleEq": 508,
}


def main():
    print("backend:", jax.default_backend(), flush=True)
    cfg = LlamaConfig(
        vocab_size=32000, hidden_size=2048, num_hidden_layers=22,
        num_attention_heads=32, num_key_value_heads=4,
        intermediate_size=5632, param_dtype="bfloat16", dtype="bfloat16",
        max_position_embeddings=PROMPT + NEW)
    t0 = time.time()
    model = LlamaForCausalLM(cfg, rngs=nnx.Rngs(0))
    init_monarch(model, {"monarch": True, "nblocks": 4, "blk_r": 4,
                         "adapter": True,
                         "target_modules": ["q_proj", "v_proj", "k_proj",
                                            "o_proj", "gate_proj",
                                            "up_proj", "down_proj"]},
                 rngs=nnx.Rngs(1))
    merge_all_adapters(model)
    model.eval()
    print(f"model built in {time.time()-t0:.0f}s", flush=True)

    rng = np.random.default_rng(0)
    mask = jnp.ones((B, PROMPT), jnp.int32)

    def fresh_ids():
        return jnp.asarray(rng.integers(2, cfg.vocab_size, (B, PROMPT)),
                           jnp.int32)

    def time_calls(fn, label):
        np.asarray(fn())  # compile + warm
        times = []
        for _ in range(ROUNDS):
            t0 = time.perf_counter()
            np.asarray(fn())
            times.append(time.perf_counter() - t0)
        t = statistics.median(times)
        ex_s = B / t
        row = {
            "ms_per_batch": round(t * 1e3, 1),
            "examples_per_s": round(ex_s, 2),
            "s_per_1k_examples": round(1000 / ex_s, 1),
            "gen_tokens_per_s": round(B * NEW / t, 1),
        }
        print(label, json.dumps(row), flush=True)
        return row

    rec = {"config": (f"TinyLlama-1.1B shape (2048h x 22L, GQA4), merged "
                      f"Monarch adapters, batch {B}, prompt {PROMPT}, "
                      f"{NEW} new tokens, whole-call timing (prefill "
                      f"included), median of {ROUNDS}")}

    gc_greedy = GenerationConfig(max_new_tokens=NEW, eos_token_id=None)
    rec["greedy"] = time_calls(
        lambda: generate(model, fresh_ids(), mask, gc_greedy), "greedy")

    gc_beam = GenerationConfig(max_new_tokens=NEW, eos_token_id=None,
                               num_beams=4)
    rec["beam4"] = time_calls(
        lambda: generate(model, fresh_ids(), mask, gc_beam), "beam4")

    # --- ReFT-intervened eval (the loreft configuration): Loreft at f7+l7
    # prompt positions; intervention_locations are traced, so the compiled
    # decode is reused across batches (models/generate.py)
    from sparse_matrix_fine_tuning_tpu.interventions.reft import (
        ReftConfig, ReftModel)
    reft = ReftModel(model, ReftConfig(representations=[
        {"layer": lay, "component": "block_output",
         "intervention": "LoreftIntervention", "low_rank_dimension": 4}
        for lay in (4, 9, 14, 19)]), rngs=nnx.Rngs(2))
    # f7+l7 positions of the (unpadded) prompt, shared by all interventions
    pos = np.concatenate([np.arange(7), PROMPT - 1 - np.arange(7)[::-1]])
    locs = jnp.asarray(np.tile(pos, (B, len(reft.interventions), 1)),
                       jnp.int32)
    rec["greedy_reft"] = time_calls(
        lambda: generate(reft, fresh_ids(), mask, gc_greedy,
                         intervention_locations=locs), "greedy_reft")

    # --- extrapolated 7-dataset math-eval wall-clock at beam 4
    total = sum(MATH_EVAL_EXAMPLES.values())
    per_ex = rec["beam4"]["s_per_1k_examples"] / 1000
    rec["seven_dataset_math_eval"] = {
        "total_examples": total,
        "extrapolated_wall_clock_min": round(total * per_ex / 60, 1),
        "datasets": MATH_EVAL_EXAMPLES,
    }
    print(json.dumps(rec), flush=True)
    out = os.path.join(os.path.dirname(__file__), "..", "results",
                       "reasoning_eval_bench.json")
    with open(out, "w") as f:
        json.dump(rec, f, indent=1)
    print(f"wrote {out}", flush=True)


if __name__ == "__main__":
    main()
