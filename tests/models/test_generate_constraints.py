"""Decode constraints: repetition_penalty and no_repeat_ngram_size.

The reference's alpaca recipe decodes greedily with repetition_penalty 1.1
and no_repeat_ngram_size 5 (task_config.py:108-120, HF logits-processor
semantics); these test the in-loop implementations against brute-force
oracles and the end-to-end n-gram property.
"""

import jax
import jax.numpy as jnp
import numpy as np

from sparse_matrix_fine_tuning_tpu.models import LlamaConfig, LlamaForCausalLM
from sparse_matrix_fine_tuning_tpu.models.generate import (
    GenerationConfig,
    _apply_repetition_penalty,
    _ban_repeated_ngrams,
    generate,
)
from sparse_matrix_fine_tuning_tpu.utils.testing import fresh_model

NEG = -1e9


def _brute_force_banned(seq, cur_len, n):
    """All tokens that would complete an n-gram already in seq[:cur_len]
    (HF NoRepeatNGramLogitsProcessor semantics)."""
    seq = list(seq[:cur_len])
    prefix = tuple(seq[cur_len - (n - 1):cur_len])
    banned = set()
    for s in range(cur_len - n + 1):
        if tuple(seq[s:s + n - 1]) == prefix:
            banned.add(seq[s + n - 1])
    return banned


def test_ban_repeated_ngrams_matches_brute_force():
    rng = np.random.default_rng(0)
    V, L, n = 11, 24, 3
    for trial in range(20):
        cur_len = int(rng.integers(n, L))
        seq = rng.integers(0, V, size=(2, L)).astype(np.int32)
        logits = jnp.zeros((2, V), jnp.float32)
        out = np.asarray(_ban_repeated_ngrams(
            logits, jnp.asarray(seq), jnp.asarray(cur_len), n))
        for b in range(2):
            want = _brute_force_banned(seq[b], cur_len, n)
            got = {v for v in range(V) if out[b, v] <= NEG / 2}
            assert got == want, (trial, b, cur_len, seq[b][:cur_len], want, got)


def test_repetition_penalty_matches_formula():
    logits = jnp.asarray([[2.0, -2.0, 1.0, -1.0]])
    presence = jnp.asarray([[True, True, False, False]])
    out = np.asarray(_apply_repetition_penalty(logits, presence, 1.25))
    np.testing.assert_allclose(out, [[2.0 / 1.25, -2.0 * 1.25, 1.0, -1.0]],
                               rtol=1e-6)


def _gen(model, cfg, seed=0, b=2, t=8):
    rng = np.random.default_rng(seed)
    ids = rng.integers(3, model.config.vocab_size, size=(b, t)).astype(np.int32)
    mask = np.ones_like(ids)
    return np.asarray(generate(model, ids, mask, cfg))


def test_no_repeat_ngram_property_end_to_end():
    """No bigram repeats within any generated sequence (prompt included),
    up to the first EOS/pad."""
    cfg = LlamaConfig.tiny()
    model = fresh_model(LlamaForCausalLM, cfg)
    gc = GenerationConfig(max_new_tokens=24, no_repeat_ngram_size=2,
                          eos_token_id=None, early_stopping=False)
    seqs = _gen(model, gc)
    for row in seqs:
        bigrams = list(zip(row[:-1], row[1:]))
        assert len(bigrams) == len(set(bigrams)), row


def test_repetition_penalty_changes_greedy_output():
    """A strong penalty must alter the greedy continuation of a tiny model
    (which otherwise tends to loop), and the run stays finite."""
    cfg = LlamaConfig.tiny()
    model = fresh_model(LlamaForCausalLM, cfg)
    base = _gen(model, GenerationConfig(max_new_tokens=16, eos_token_id=None,
                                        early_stopping=False))
    pen = _gen(model, GenerationConfig(max_new_tokens=16, eos_token_id=None,
                                       early_stopping=False,
                                       repetition_penalty=5.0))
    assert base.shape == pen.shape
    assert (base != pen).any()


def test_constraints_rejected_with_beams():
    cfg = LlamaConfig.tiny()
    model = fresh_model(LlamaForCausalLM, cfg)
    ids = np.ones((1, 4), np.int32)
    import pytest
    with pytest.raises(NotImplementedError):
        generate(model, ids, np.ones_like(ids),
                 GenerationConfig(num_beams=2, no_repeat_ngram_size=3))
