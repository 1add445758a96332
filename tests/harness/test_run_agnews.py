"""AG News harness smoke: the three-method comparison learns + logs."""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)


def _run(tmp_path, method):
    import run_agnews
    argv = ["run_agnews.py", "--method", method, "--smoke=True",
            f"--output_dir={tmp_path}", "--epochs=30", "--lr=0.01",
            "--logging_steps=0"]
    old = sys.argv
    sys.argv = argv
    try:
        return run_agnews.main()
    finally:
        sys.argv = old


def test_agnews_monarch_learns(tmp_path):
    res = _run(tmp_path, "monarch")
    assert res["eval_accuracy"] > 0.5
    assert res["trainable_params"] < res["total_params"] * 0.5
    path = os.path.join(str(tmp_path), "monarch", "metrics.jsonl")
    assert os.path.exists(path)


def test_agnews_lora_and_full_run(tmp_path):
    for method in ("lora", "full"):
        res = _run(tmp_path, method)
        assert res["eval_accuracy"] > 0.5, method
