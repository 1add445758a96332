"""Byte-parity of prompt templates vs the reference's templates.py.

EM eval breaks if a prompt differs by even one byte (tokenization shifts
every intervention location); data/templates.py declares byte-for-byte
parity with the reference -- this test enforces it against the reference
file itself.
"""

import importlib.util

from sparse_matrix_fine_tuning_tpu.data import templates as ours


def _load_ref():
    spec = importlib.util.spec_from_file_location(
        "ref_templates", "/root/reference/pyreft/loreft/templates.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_all_reference_template_constants_match_byte_for_byte():
    ref = _load_ref()
    ref_names = [n for n in dir(ref) if not n.startswith("_")]
    assert ref_names, "reference template module unexpectedly empty"
    for name in ref_names:
        assert hasattr(ours, name), f"missing template constant: {name}"
        assert getattr(ours, name) == getattr(ref, name), (
            f"template {name} differs from the reference byte-for-byte")
