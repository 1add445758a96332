"""Differential test of the qlora causal-LM collator vs the reference.

Training-loss parity for the alpaca flow hinges on the collator's
source/target truncation, BOS/EOS placement, and label masking
(reference qlora/qlora_monarch.py:322-378 DataCollatorForCausalLM).
The reference module's top-level imports need a GPU stack, so the
collator CLASS is extracted by ast from the reference file and executed
with its real dependencies (torch, pad_sequence) -- the code under test
is byte-identical to the reference's.

A tiny word-level HF tokenizer (built offline from `tokenizers`) drives
both implementations; BOS/EOS are literal words so the reference's
string-concatenation idiom (f"{bos_token}{input}") tokenizes cleanly.
"""

import ast
import copy as _copy
from dataclasses import dataclass
from typing import Dict, Sequence

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from sparse_matrix_fine_tuning_tpu.data.alpaca import (  # noqa: E402
    IGNORE_INDEX,
    collate_causal_lm,
)
from sparse_matrix_fine_tuning_tpu.data.tokenizer import (  # noqa: E402
    HFTokenizerWrapper,
)

REF_FILE = "/root/reference/qlora/qlora_monarch.py"


@pytest.fixture(scope="module")
def ref_collator_cls():
    """The reference DataCollatorForCausalLM, extracted by ast so its
    module's GPU-stack imports never run; the class body is the
    reference's own code, unmodified."""
    tree = ast.parse(open(REF_FILE).read())
    node = next(n for n in tree.body
                if isinstance(n, ast.ClassDef)
                and n.name == "DataCollatorForCausalLM")
    mod = ast.Module(body=[node], type_ignores=[])
    ns = {
        "torch": torch,
        "transformers": transformers,
        "pad_sequence": torch.nn.utils.rnn.pad_sequence,
        "IGNORE_INDEX": IGNORE_INDEX,
        "copy": _copy,
        "Sequence": Sequence,
        "Dict": Dict,
        "dataclass": dataclass,
    }
    exec(compile(mod, REF_FILE, "exec"), ns)  # noqa: S102 -- reference code
    return dataclass(ns["DataCollatorForCausalLM"])


@pytest.fixture(scope="module")
def toy_tokenizer():
    from tokenizers import Tokenizer, models, pre_tokenizers
    from tokenizers.processors import TemplateProcessing

    words = ("BOS EOS PAD UNK hello world how are you fine thanks a b c d "
             "e f g h i j k l m n o p q r s t u v w x y z . , ? !").split()
    vocab = {w: i for i, w in enumerate(words)}
    tok = Tokenizer(models.WordLevel(vocab, unk_token="UNK"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    tok.post_processor = TemplateProcessing(
        single="BOS $A", pair="BOS $A $B",
        special_tokens=[("BOS", vocab["BOS"])])
    hf = transformers.PreTrainedTokenizerFast(
        tokenizer_object=tok, bos_token="BOS", eos_token="EOS",
        pad_token="PAD", unk_token="UNK")
    return hf


def _instances():
    # inputs start with a space / outputs end with one so the reference's
    # f"{bos}{input}" / f"{output}{eos}" concatenations split cleanly
    return [
        {"input": " hello world how are you ?", "output": "fine thanks "},
        {"input": " a b c d e f g h i j k l m n o p", "output": "q r s t u v w x y z "},
        {"input": " hello . world ,", "output": "a b "},
        {"input": " x", "output": "y "},
    ]


@pytest.mark.parametrize("source_max_len,target_max_len", [
    (64, 64),     # no truncation
    (8, 4),       # both sides truncate (EOS cut on long targets)
    (3, 64),      # source truncates below prompt length
])
@pytest.mark.parametrize("train_on_source", [False, True])
def test_train_collation_matches_reference(
        ref_collator_cls, toy_tokenizer, source_max_len, target_max_len,
        train_on_source):
    items = _instances()
    ref = ref_collator_cls(
        tokenizer=toy_tokenizer, source_max_len=source_max_len,
        target_max_len=target_max_len, train_on_source=train_on_source,
        predict_with_generate=False)
    want = ref(items)

    ours = collate_causal_lm(
        [dict(raw_input=it["input"], output=it["output"]) for it in items],
        HFTokenizerWrapper(toy_tokenizer),
        source_max_len=source_max_len, target_max_len=target_max_len,
        train_on_source=train_on_source, predict_with_generate=False)

    np.testing.assert_array_equal(
        ours["input_ids"], want["input_ids"].numpy())
    np.testing.assert_array_equal(
        ours["attention_mask"].astype(bool), want["attention_mask"].numpy())
    np.testing.assert_array_equal(ours["labels"], want["labels"].numpy())


def test_predict_collation_matches_reference_modulo_padding_side(
        ref_collator_cls, toy_tokenizer):
    """predict_with_generate: same source tokens; this repo LEFT-pads
    (required for the KV-cache decode) where the reference right-pads, so
    compare the unpadded rows."""
    items = _instances()
    ref = ref_collator_cls(
        tokenizer=toy_tokenizer, source_max_len=8, target_max_len=4,
        train_on_source=False, predict_with_generate=True)
    want = ref(items)["input_ids"].numpy()
    pad = toy_tokenizer.pad_token_id

    ours = collate_causal_lm(
        [dict(raw_input=it["input"], output=it["output"]) for it in items],
        HFTokenizerWrapper(toy_tokenizer),
        source_max_len=8, target_max_len=4, predict_with_generate=True)
    got = ours["input_ids"]
    for i in range(len(items)):
        w = [t for t in want[i] if t != pad]
        g = [t for t in got[i] if t != pad]
        assert g == w, (i, g, w)
