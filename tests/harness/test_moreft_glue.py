"""MoReFT GLUE flow (reference moreft_glue.sh): classification through the
ReFT wrapper with MoRe interventions on RoBERTa block outputs."""

import json
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)


def _run(tmp_path, extra):
    import run_reasoning
    argv = ["run_reasoning.py", "-task", "glue", "-train_dataset", "cola",
            "-p", "f1", "-e", "2", "-lr", "3e-3",
            "--intervention_type=MoReIntervention", "-batch_size", "16",
            "-gradient_accumulation_steps", "1", "-max_length", "64",
            "-rank", "4", "--smoke=True", f"--output_dir={tmp_path}/",
            "--logging_steps=0"] + extra
    old = sys.argv
    sys.argv = argv
    try:
        return run_reasoning.main()
    finally:
        sys.argv = old


def test_moreft_glue_end_to_end(tmp_path):
    metrics = _run(tmp_path, ["-allow_cls_grad"])
    assert "matthews_correlation" in metrics
    assert os.path.exists(os.path.join(str(tmp_path), "glue_cola",
                                       "metrics.json"))


def test_moreft_glue_trainable_set_respects_allow_cls_grad():
    """Without -allow_cls_grad only intervention params train; with it the
    classifier joins (reference loreft/train.py:182)."""
    from flax import nnx

    from sparse_matrix_fine_tuning_tpu.interventions import (
        ReftConfig, get_reft_model)
    from sparse_matrix_fine_tuning_tpu.models import (
        RobertaConfig, RobertaForSequenceClassification)
    from sparse_matrix_fine_tuning_tpu.peft import trainable_filter

    cfg = RobertaConfig.tiny(num_labels=2)
    m = RobertaForSequenceClassification(cfg, rngs=nnx.Rngs(0))
    reft = get_reft_model(m, ReftConfig(representations=[
        {"layer": 0, "intervention": "MoReIntervention",
         "low_rank_dimension": 4}]), rngs=nnx.Rngs(1))
    paths = lambda extra: {"/".join(map(str, p)) for p, _ in
                           nnx.to_flat_state(nnx.state(reft,
                                                       trainable_filter(extra)))}
    no_cls = paths(())
    with_cls = paths(("classifier",))
    assert all("interventions" in p for p in no_cls) and no_cls
    assert any("classifier" in p for p in with_cls)
    assert not any("roberta/layer" in p for p in with_cls)  # base frozen
