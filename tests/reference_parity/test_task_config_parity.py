"""TASK_CONFIG parity vs the reference's task_config.py.

Dataset lists, prompt templates, trigger tokens and generation args are
metric-bearing constants (they define what the reasoning harness trains
on and how it decodes); this compares them field-by-field against the
reference's own module.
"""

import importlib.util
import sys

from sparse_matrix_fine_tuning_tpu.data.reasoning import TASK_CONFIG


def _load_ref():
    # task_config.py does `from templates import *` relative to its dir
    tspec = importlib.util.spec_from_file_location(
        "templates", "/root/reference/pyreft/loreft/templates.py")
    tmod = importlib.util.module_from_spec(tspec)
    tspec.loader.exec_module(tmod)
    sys.modules.setdefault("templates", tmod)
    try:
        spec = importlib.util.spec_from_file_location(
            "ref_task_config", "/root/reference/pyreft/loreft/task_config.py")
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        if sys.modules.get("templates") is tmod:
            del sys.modules["templates"]
    return mod.task_config


FIELDS = ["train_datasets", "eval_datasets", "task_prompt_template",
          "trigger_tokens", "generation_args"]


def test_task_config_fields_match_reference():
    ref = _load_ref()
    shared = [t for t in TASK_CONFIG if t in ref]
    # every production task the harness supports must be reference-backed
    assert {"commonsense", "math", "alpaca", "gsm8k"} <= set(shared)
    for task in shared:
        for field in FIELDS:
            if field not in ref[task]:
                continue
            assert TASK_CONFIG[task].get(field) == ref[task][field], (
                f"{task}.{field} differs from reference task_config.py")


def test_tune_variants_use_train_set_for_eval():
    ref = _load_ref()
    for name in ["tune_math", "tune_commonsense"]:
        if name in ref and name in TASK_CONFIG:
            assert (TASK_CONFIG[name]["eval_datasets"]
                    == ref[name]["eval_datasets"]), name
