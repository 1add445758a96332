"""Differential test of answer extraction vs the reference's own code.

EM accuracy parity on the reasoning benchmarks hinges on extraction
semantics (reference pyreft/loreft/compute_metrics.py:32-81, which itself
follows LLM-Adapters "for fair comparison").  This imports the reference
module by file path (stubbing its heavyweight eval-time imports) and
fuzzes both implementations with generation-shaped strings.
"""

import importlib.machinery
import importlib.util
import random
import string
import sys
import types

import pytest

torch = pytest.importorskip("torch")

from sparse_matrix_fine_tuning_tpu.evaluation.reasoning import (  # noqa: E402
    extract_answer_letter,
    extract_answer_number,
    extract_output,
)


@pytest.fixture(scope="module")
def ref_cm():
    """Reference compute_metrics, imported by file path with stubs for its
    module-scope imports that eval-time-only code needs (evaluate, pyvene,
    task_config, pyreft, datasets)."""
    stubs = {}
    for name in ["evaluate", "task_config", "pyvene", "pyreft"]:
        if name not in sys.modules:
            mod = types.ModuleType(name)
            mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
            if name == "task_config":
                mod.task_config = {}
            if name == "pyreft":
                mod.ReftDataCollator = object
            if name == "pyvene":
                # annotations like pv.IntervenableModel are evaluated at
                # def time; any non-dunder attribute works as a placeholder
                # (dunders must keep raising so importlib metadata lookups
                # fall back correctly)
                def _attr(n):
                    if n.startswith("__"):
                        raise AttributeError(n)
                    return object

                mod.__getattr__ = _attr
            sys.modules[name] = mod
            stubs[name] = mod
    try:
        spec = importlib.util.spec_from_file_location(
            "ref_compute_metrics",
            "/root/reference/pyreft/loreft/compute_metrics.py")
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        for name in stubs:
            sys.modules.pop(name, None)
    return mod


def _fuzz_strings(n=400, seed=0):
    rng = random.Random(seed)
    pieces = [
        "the answer is", "Answer:", "so", "therefore", "= ", "-", ".",
        ",", "about", "roughly", "-3.5", "42", "1,234", "7.5e2", "0",
        "answer A", "B)", "(C)", "D.", "E", "no digits", "x", "\n",
        "3 then 7", "100,000.25", "-0.", "..", "9..5", ",,",
    ]
    out = []
    for _ in range(n):
        k = rng.randint(0, 8)
        s = " ".join(rng.choice(pieces) for _ in range(k))
        # sprinkle raw randomness
        if rng.random() < 0.3:
            s += "".join(rng.choice(string.printable[:70])
                         for _ in range(rng.randint(0, 12)))
        out.append(s)
    return out


def test_extract_answer_number_matches_reference(ref_cm):
    for s in _fuzz_strings(seed=1):
        assert extract_answer_number(s) == ref_cm.extract_answer_number(s), s


def test_extract_answer_letter_matches_reference(ref_cm):
    for s in _fuzz_strings(seed=2):
        assert extract_answer_letter(s) == ref_cm.extract_answer_letter(s), s


def test_extract_output_matches_reference(ref_cm):
    triggers = ["", "### Response:", "the answer is", "\n"]
    for s in _fuzz_strings(seed=3):
        for t in triggers:
            assert extract_output(s, t) == ref_cm.extract_output(s, t), (s, t)
