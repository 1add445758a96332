"""MMLU data loading: qlora artifact format + logit scoring integration.

The reference evaluates MMLU from JSON-lines artifacts of
{subject, input, output} with pre-formatted zero-shot prompts
(reference qlora/qlora.py:636-660, data/mmlu/zero_shot_mmlu_val.json).
"""

import json
import os

import numpy as np
import pytest

from sparse_matrix_fine_tuning_tpu.data.mmlu import (
    ABCD, load_mmlu_items, mmlu_accuracy)
from sparse_matrix_fine_tuning_tpu.utils.testing import fresh_model

_QLORA_VAL = "/root/reference/qlora/data/mmlu/zero_shot_mmlu_val.json"


def _write_qlora_file(tmp_path, name="eval.json", n=6):
    d = tmp_path / "mmlu"
    d.mkdir()
    with open(d / name, "w") as f:
        for i in range(n):
            f.write(json.dumps({
                "subject": ["algebra", "law"][i % 2],
                "input": f"Question {i}?\nA. a\nB. b\nC. c\nD. d\nAnswer:",
                "output": ABCD[i % 4],
            }) + "\n")
    return str(tmp_path)


def test_load_qlora_jsonl_format(tmp_path):
    items = load_mmlu_items(_write_qlora_file(tmp_path), "eval")
    assert len(items) == 6
    assert items[0]["prompt"].endswith("Answer:")
    assert items[0]["answer"] in ABCD
    assert {i["subject"] for i in items} == {"algebra", "law"}


def test_load_qlora_artifact_filename(tmp_path):
    # the reference's own filename (zero_shot_mmlu_val.json) resolves too
    root = _write_qlora_file(tmp_path, name="zero_shot_mmlu_val.json")
    items = load_mmlu_items(root, "eval")
    assert len(items) == 6 and "prompt" in items[0]


def test_scoring_runs_on_preformatted_items(tmp_path):
    from flax import nnx
    from sparse_matrix_fine_tuning_tpu.data.tokenizer import get_tokenizer
    from sparse_matrix_fine_tuning_tpu.models import (
        LlamaConfig, LlamaForCausalLM)

    items = load_mmlu_items(_write_qlora_file(tmp_path), "eval")
    tok = get_tokenizer(None)
    cfg = LlamaConfig(vocab_size=tok.vocab_size, hidden_size=64,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2, intermediate_size=128,
                      max_position_embeddings=128)
    model = fresh_model(LlamaForCausalLM, cfg)
    metrics = mmlu_accuracy(model, tok, items, None, k_shot=0,
                            max_length=128, batch_size=4)
    assert 0.0 <= metrics["mmlu_eval_accuracy"] <= 1.0
    assert "mmlu_eval_accuracy_algebra" in metrics


@pytest.mark.skipif(not os.path.exists(_QLORA_VAL),
                    reason="reference snapshot not present")
def test_loads_real_reference_artifact():
    items = load_mmlu_items(os.path.dirname(os.path.dirname(_QLORA_VAL)),
                            "eval")
    assert len(items) > 1000
    subs = {i["subject"] for i in items}
    assert "abstract_algebra" in subs
    assert all(i["answer"] in ABCD for i in items[:50])
