"""Jitted eval/predict path (evaluation/predict.py): correctness vs the
eager per-batch loop, tail-batch padding, and the compile-once guarantee
(VERDICT r2 #3: eval dispatches O(batches), not O(ops))."""

import numpy as np
from flax import nnx

import jax.numpy as jnp

from sparse_matrix_fine_tuning_tpu.evaluation.predict import (
    _batch_logits,
    predict_classes,
    predict_logits,
)
from sparse_matrix_fine_tuning_tpu.models import (
    RobertaConfig,
    RobertaForSequenceClassification,
)
from sparse_matrix_fine_tuning_tpu.utils.testing import fresh_model


def _tiny_model(num_labels=3):
    cfg = RobertaConfig.tiny(num_labels=num_labels, hidden_dropout_prob=0.0,
                             attention_probs_dropout_prob=0.0)
    return fresh_model(RobertaForSequenceClassification, cfg)


def _data(n, L=10, vocab=128, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "input_ids": rng.integers(2, vocab, size=(n, L)).astype(np.int32),
        "attention_mask": np.ones((n, L), np.int32),
        "labels": rng.integers(0, 3, size=(n,)),
    }


def test_predict_logits_matches_eager_forward_including_tail():
    model = _tiny_model()
    data = _data(n=21)  # 21 = 2 full batches of 8 + tail of 5
    out = predict_logits(model, data, batch_size=8)
    assert out.shape == (21, 3)
    model.eval()
    eager = np.asarray(model(jnp.asarray(data["input_ids"]),
                             jnp.asarray(data["attention_mask"])),
                       dtype=np.float32)
    np.testing.assert_allclose(out, eager, rtol=2e-5, atol=2e-5)


def test_predict_compiles_once_across_calls():
    """The metrics path must reuse ONE executable per batch shape; repeated
    in-training evals must not recompile (jit cache keyed on graphdef)."""
    model = _tiny_model()
    data = _data(n=16, seed=1)
    predict_logits(model, data, batch_size=8)
    after_first = _batch_logits._cache_size()
    assert after_first >= 1

    # repeated evals (e.g. next epoch) hit the cache, even after parameter
    # updates (state is a traced arg, graphdef unchanged) and for a fresh
    # structurally-identical model
    model.classifier.out_proj.kernel.set_value(
        model.classifier.out_proj.kernel[...] + 0.1)
    predict_logits(model, data, batch_size=8)
    predict_logits(_tiny_model(), data, batch_size=8)
    assert _batch_logits._cache_size() == after_first


def test_predict_classes_regression_head():
    model = _tiny_model(num_labels=1)
    data = _data(n=5, seed=2)
    scores = predict_classes(model, data, batch_size=4)
    assert scores.shape == (5,)
    assert scores.dtype == np.float32


def test_predict_empty_split_keeps_logit_width():
    """An empty split must return (0, num_labels) so predict_classes still
    routes multi-class models to argmax (a (0, 1) fallback would take the
    single-logit regression branch and emit float scores)."""
    model = _tiny_model(num_labels=3)
    data = _data(n=0, seed=3)
    logits = predict_logits(model, data, batch_size=4)
    assert logits.shape == (0, 3)
    preds = predict_classes(model, data, batch_size=4)
    assert preds.shape == (0,) and preds.dtype != np.float32
