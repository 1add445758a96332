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


def test_prompt_presence_matches_hf_processor_with_pads():
    """HF's RepetitionPenaltyLogitsProcessor gathers over the FULL padded
    input_ids (pads included); the presence set feeding
    _apply_repetition_penalty must reproduce its output exactly on a
    left-padded batch."""
    import pytest
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    from sparse_matrix_fine_tuning_tpu.models.generate import _prompt_presence

    rng = np.random.default_rng(7)
    V, b, t = 13, 3, 6
    ids = rng.integers(1, V, size=(b, t)).astype(np.int32)
    ids[1, :3] = 0  # left padding (pad_token_id=0)
    logits = rng.normal(size=(b, V)).astype(np.float32)

    proc = transformers.RepetitionPenaltyLogitsProcessor(penalty=1.3)
    want = proc(torch.tensor(ids, dtype=torch.long),
                torch.tensor(logits)).numpy()
    presence = _prompt_presence(jnp.asarray(ids), V)
    got = np.asarray(_apply_repetition_penalty(
        jnp.asarray(logits), presence, 1.3))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_greedy_penalty_with_padding_matches_hf():
    """End-to-end: greedy decode with the alpaca-recipe constraints on a
    left-padded batch must match HF generate token-for-token."""
    import pytest
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    from sparse_matrix_fine_tuning_tpu.models.hf_convert import load_llama

    hf_cfg = transformers.LlamaConfig(
        vocab_size=256, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, intermediate_size=128,
        max_position_embeddings=128, rms_norm_eps=1e-5,
        tie_word_embeddings=False, attn_implementation="eager")
    torch.manual_seed(0)
    hf_model = transformers.LlamaForCausalLM(hf_cfg).eval()
    model = fresh_model(LlamaForCausalLM, LlamaConfig.tiny())
    load_llama(model, dict(hf_model.state_dict()))
    model.eval()

    rng = np.random.default_rng(4)
    ids = rng.integers(3, 256, size=(3, 9))
    mask = np.ones_like(ids)
    ids[1, :3] = 0
    mask[1, :3] = 0
    NEW = 12
    with torch.no_grad():
        want = hf_model.generate(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask),
            max_new_tokens=NEW, do_sample=False, num_beams=1,
            repetition_penalty=2.0, no_repeat_ngram_size=5,
            eos_token_id=None, pad_token_id=0).numpy()
    got = np.asarray(generate(
        model, jnp.asarray(ids), jnp.asarray(mask),
        GenerationConfig(max_new_tokens=NEW, eos_token_id=None,
                         repetition_penalty=2.0, no_repeat_ngram_size=5)))
    np.testing.assert_array_equal(got[:, -NEW:], want[:, -NEW:])


def test_constraints_rejected_with_beams():
    cfg = LlamaConfig.tiny()
    model = fresh_model(LlamaForCausalLM, cfg)
    ids = np.ones((1, 4), np.int32)
    import pytest
    with pytest.raises(NotImplementedError):
        generate(model, ids, np.ones_like(ids),
                 GenerationConfig(num_beams=2, no_repeat_ngram_size=3))
