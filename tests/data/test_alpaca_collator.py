"""qlora collator parity: independent source/target truncation,
train_on_source, predict_with_generate (reference qlora_monarch.py:322-378)."""

import numpy as np

from sparse_matrix_fine_tuning_tpu.data.alpaca import (
    collate_causal_lm,
    train_eval_split,
)
from sparse_matrix_fine_tuning_tpu.data.templates import IGNORE_INDEX
from sparse_matrix_fine_tuning_tpu.data.tokenizer import SimpleTokenizer

ITEMS = [
    {"instruction": "add 2 and 2", "input": "", "output": "4"},
    {"instruction": "repeat " * 300, "input": "ctx", "output": "word " * 200},
]


def test_independent_truncation():
    tok = SimpleTokenizer(vocab_size=512)
    out = collate_causal_lm(ITEMS, tok, source_max_len=64, target_max_len=16)
    labels, mask = out["labels"], out["attention_mask"]
    # long row: source capped at 64 (all IGNORE), target capped at 16
    row = 1
    n_src = int((labels[row] == IGNORE_INDEX).sum() - (mask[row] == 0).sum())
    assert n_src == 64
    assert int((labels[row] != IGNORE_INDEX).sum()) == 16
    # short row unaffected: target tokens supervised, source masked
    assert int((labels[0] != IGNORE_INDEX).sum()) >= 1


def test_train_on_source_supervises_prompt():
    tok = SimpleTokenizer(vocab_size=512)
    out = collate_causal_lm(ITEMS, tok, source_max_len=64, target_max_len=16,
                            train_on_source=True)
    valid = out["attention_mask"][0] == 1
    np.testing.assert_array_equal(out["labels"][0][valid],
                                  out["input_ids"][0][valid])


def test_predict_with_generate_source_only():
    tok = SimpleTokenizer(vocab_size=512)
    out = collate_causal_lm(ITEMS, tok, source_max_len=64, target_max_len=16,
                            predict_with_generate=True)
    assert "labels" not in out
    assert out["input_ids"].shape[1] <= 64


def test_predict_with_generate_left_pads():
    """generate() prefill takes the next-token logit at position -1, so
    predict rows must end flush right (reference flips padding_side for
    generation, compute_metrics.py:118)."""
    tok = SimpleTokenizer(vocab_size=512)
    out = collate_causal_lm(ITEMS, tok, source_max_len=64, target_max_len=16,
                            predict_with_generate=True)
    ids, mask = out["input_ids"], out["attention_mask"]
    for i in range(len(ids)):
        # last position is always a real token...
        assert mask[i, -1] == 1 and ids[i, -1] != tok.pad_token_id
        # ...and padding (if any) is a contiguous prefix
        L = int(mask[i].sum())
        np.testing.assert_array_equal(mask[i, :len(ids[i]) - L], 0)
        np.testing.assert_array_equal(mask[i, len(ids[i]) - L:], 1)
    # training rows stay right-padded
    tr = collate_causal_lm(ITEMS, tok, source_max_len=64, target_max_len=16)
    assert tr["attention_mask"][0, 0] == 1


def test_format_items_reference_formats():
    """Per-dataset raw-row normalisation mirrors the reference's
    format_dataset (qlora_monarch.py:488-530)."""
    from sparse_matrix_fine_tuning_tpu.data.alpaca import format_items

    chip2 = format_items([{"text": "<human>: hi there\n<bot>: hello!"}],
                         None, "chip2")
    assert chip2 == [{"raw_input": "hi there", "output": "hello!"}]
    si = format_items([{"prompt": "p", "completion": "c"}], None,
                      "self-instruct")
    assert si == [{"raw_input": "p", "output": "c"}]
    hh = format_items([{"chosen": "good", "rejected": "bad"}], None, "hh-rlhf")
    assert hh == [{"raw_input": "", "output": "good"}]
    oa = format_items([{"text": "convo"}], None, "oasst1")
    assert oa == [{"raw_input": "", "output": "convo"}]
    io = format_items([{"input": "q", "output": "a"}], "input-output")
    assert io == [{"raw_input": "q", "output": "a"}]
    # alpaca rows pass through untouched (template applies at collate time)
    alp = [{"instruction": "i", "input": "", "output": "o"}]
    assert format_items(alp, None, "alpaca") == alp


def test_collate_raw_input_items():
    """raw_input rows collate without the alpaca template: source is the
    raw string, labels mask exactly the source span."""
    tok = SimpleTokenizer(vocab_size=512)
    items = [{"raw_input": "human question here", "output": "bot answer"}]
    out = collate_causal_lm(items, tok, source_max_len=32, target_max_len=16)
    src_len = len(tok.encode_ids("human question here", add_bos=True))
    labels = out["labels"][0]
    assert (labels[:src_len] == IGNORE_INDEX).all()
    n_target = int((labels != IGNORE_INDEX).sum())
    assert n_target == len(tok.encode_ids("bot answer", add_bos=False)) + 1


def test_train_eval_split_held_out():
    items = [{"instruction": f"q{i}", "input": "", "output": str(i)}
             for i in range(40)]
    tr, ev = train_eval_split(items, eval_dataset_size=5, seed=0)
    assert len(ev) == 5 and len(tr) == 35
    seen = {x["instruction"] for x in tr}
    assert all(x["instruction"] not in seen for x in ev)
