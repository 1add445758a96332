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
