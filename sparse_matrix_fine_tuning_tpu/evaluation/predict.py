"""Jitted batch prediction shared by the classification harnesses.

The reference gets compiled eval for free from HF Trainer's ``predict``
(reference run_glue.py:789-816); in JAX an eager per-batch loop would
dispatch every op individually (~ms fixed cost per dispatch through the
TPU tunnel -- docs/BENCHMARKS.md), so eval/predict must run through ONE
jitted ``(state, ids, mask) -> logits`` function per batch shape, exactly
like the MMLU evaluator (data/mmlu.py:147-151).

Tail batches are padded by repeating the last row (always a valid example;
all-zero attention masks would NaN the softmax) and the padded outputs are
discarded.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx


@partial(jax.jit, static_argnums=0)
def _batch_logits(graphdef, state, ids, mask):
    model = nnx.merge(graphdef, state)
    return model(ids, mask)


@partial(jax.jit, static_argnums=0)
def _batch_logits_locs(graphdef, state, ids, mask, locs):
    # intervened classification (MoReFT GLUE): the eval forward must apply
    # the same block-output interventions as training
    model = nnx.merge(graphdef, state)
    return model(ids, mask, intervention_locations=locs)


def predict_logits(model: nnx.Module, data, batch_size: int = 64,
                   locations=None) -> np.ndarray:
    """Run the classifier over ``data`` through one compiled function.

    Args:
      model: an NNX classification model taking (input_ids, attention_mask).
      data: dict with "input_ids" and "attention_mask" (array-likes, (n, L)).
      locations: optional (n, num_interventions, p) intervention locations
        for ReFT-wrapped classifiers (MoReFT GLUE).
    Returns:
      (n, num_labels) float32 logits.

    Compiles once per (batch_size, seq_len) shape; the jit cache is keyed on
    the model's graphdef, so repeated in-training evals reuse the executable.
    """
    model.eval()
    graphdef, state = nnx.split(model)
    ids = np.asarray(data["input_ids"])
    mask = np.asarray(data["attention_mask"])
    locs = None if locations is None else np.asarray(locations)
    n = len(ids)
    outs = []
    for s in range(0, n, batch_size):
        b_ids, b_mask = ids[s:s + batch_size], mask[s:s + batch_size]
        b_locs = None if locs is None else locs[s:s + batch_size]
        k = len(b_ids)
        if k < batch_size:  # pad tail to the compiled shape (data/mmlu.py:155-158)
            reps = batch_size - k
            b_ids = np.concatenate([b_ids, np.repeat(b_ids[-1:], reps, 0)])
            b_mask = np.concatenate([b_mask, np.repeat(b_mask[-1:], reps, 0)])
            if b_locs is not None:
                b_locs = np.concatenate(
                    [b_locs, np.repeat(b_locs[-1:], reps, 0)])
        if b_locs is None:
            logits = _batch_logits(graphdef, state, jnp.asarray(b_ids),
                                   jnp.asarray(b_mask))
        else:
            logits = _batch_logits_locs(graphdef, state, jnp.asarray(b_ids),
                                        jnp.asarray(b_mask),
                                        jnp.asarray(b_locs))
        outs.append(np.asarray(logits[:k], dtype=np.float32))
    if outs:
        return np.concatenate(outs)
    # empty split: keep the logit width honest so predict_classes still
    # routes multi-class models to argmax, not the single-logit branch
    width = getattr(getattr(model, "config", None), "num_labels", 1)
    return np.zeros((0, width), np.float32)


def predict_classes(model: nnx.Module, data, batch_size: int = 64,
                    locations=None) -> np.ndarray:
    """argmax predictions (or raw scores for single-logit regression heads)."""
    logits = predict_logits(model, data, batch_size, locations=locations)
    if logits.shape[-1] == 1:
        return logits[:, 0]
    return np.argmax(logits, -1)
