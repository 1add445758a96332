"""Reasoning harness smoke: pipeline mechanics end-to-end (training +
7-dataset generation eval + logging).  Learnability at full budget is
exercised by the longer driver validation run (results/reasoning)."""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)


def test_reasoning_smoke_pipeline(tmp_path):
    import run_reasoning
    argv = ["run_reasoning.py", "-task", "math", "--smoke=True", "-e", "2",
            "-batch_size", "8", "-gradient_accumulation_steps", "2",
            f"--output_dir={tmp_path}", "--logging_steps=0",
            "--max_n_train_example=32", "--max_n_eval_example=16"]
    old = sys.argv
    sys.argv = argv
    try:
        results = run_reasoning.main()
    finally:
        sys.argv = old
    # all 7 math eval datasets reported (distinct synthetic data per name)
    for ds in ("MultiArith", "gsm8k", "SVAMP", "mawps", "AddSub", "AQuA",
               "SingleEq"):
        assert f"eval/{ds}" in results
    assert "eval/average" in results
    out = os.path.join(str(tmp_path), "math")
    assert os.path.exists(os.path.join(out, "eval_results.json"))
    assert os.path.exists(os.path.join(out, "metrics.jsonl"))
    recs = [json.loads(l) for l in open(os.path.join(out, "metrics.jsonl"))]
    assert any(k.startswith("watch/") for r in recs for k in r)


def test_instruct_task_dumps_alpaca_eval_generations(tmp_path):
    """instruct/ultrafeedback: open-ended tasks produce alpaca_eval-format
    generation dumps instead of EM (reference compute_metrics.py:236-245)."""
    import run_reasoning
    argv = ["run_reasoning.py", "-task", "instruct", "--smoke=True",
            "-p", "f5+l5", "-e", "1", "-batch_size", "4",
            "-gradient_accumulation_steps", "1", "-max_length", "96",
            f"--output_dir={tmp_path}", "--logging_steps=0",
            "--max_n_train_example=16", "--max_n_eval_example=4"]
    old = sys.argv
    sys.argv = argv
    try:
        run_reasoning.main()
    finally:
        sys.argv = old
    gen_path = os.path.join(str(tmp_path), "instruct", "generations.json")
    gens = json.load(open(gen_path))
    assert gens and {"instruction", "output", "dataset",
                     "generator"} <= set(gens[0])
