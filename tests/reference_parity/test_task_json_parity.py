"""Per-task recipe JSON parity vs the reference's task_configs/.

The reference's recipes live in per-task JSON (HF TrainingArguments) +
per-family peft_config.json; this framework deliberately mirrors them
key-for-key so recipes port 1:1 (docs/MIGRATION.md).  This test walks
every reference config file and asserts (a) the same-named file exists
here, (b) every reference key is present except torch/HF-runtime-specific
ones, and (c) shared keys carry EQUAL values except the documented
localizations.
"""

import json
import os

import pytest

REF = "/root/reference/task_configs"
OURS = os.path.join(os.path.dirname(__file__), "..", "..", "task_configs")

# torch/HF-runtime flags with no TPU analogue (precision policy is the
# trainer's; HF Trainer plumbing keys); dropping them is the documented
# migration behavior
TORCH_ONLY = {"bf16", "fp16", "evaluation_strategy", "overwrite_output_dir",
              "report_to", "tf32", "half_precision_backend",
              "dataloader_num_workers", "ddp_find_unused_parameters",
              "skip_memory_metrics", "eval_accumulation_steps"}
# values localized to this repo (paths) or renamed task files
VALUE_EXEMPT = {"output_dir"}

FAMILIES = ["monarch_roberta_glue", "deberta_glue", "boft_roberta_glue",
            "lora_roberta_glue"]


def _ref_jsons(family):
    d = os.path.join(REF, family)
    if not os.path.isdir(d):
        return []
    return sorted(f for f in os.listdir(d) if f.endswith(".json"))


def _our_name(family, fname):
    # reference names sst "sst-2.json"; this repo uses the GLUE task id
    ours = {"sst-2.json": "sst2.json"}.get(fname, fname)
    return os.path.join(OURS, family, ours)


@pytest.mark.parametrize("family", FAMILIES)
def test_family_configs_mirror_reference(family):
    files = _ref_jsons(family)
    assert files, f"reference family {family} unexpectedly empty"
    for fname in files:
        ref_path = os.path.join(REF, family, fname)
        our_path = _our_name(family, fname)
        assert os.path.exists(our_path), f"missing config: {family}/{fname}"
        ref_cfg = json.load(open(ref_path))
        our_cfg = json.load(open(our_path))
        if not isinstance(ref_cfg, dict):
            continue
        missing = [k for k in ref_cfg
                   if k not in our_cfg and k not in TORCH_ONLY]
        assert not missing, f"{family}/{fname} missing keys: {missing}"
        diff = {k: (our_cfg[k], ref_cfg[k])
                for k in ref_cfg
                if k in our_cfg and k not in VALUE_EXEMPT
                and our_cfg[k] != ref_cfg[k]}
        assert not diff, f"{family}/{fname} value drift: {diff}"


def test_llama_peft_config_mirrors_reference():
    ref_cfg = json.load(open(os.path.join(REF, "llama", "peft_config.json")))
    our_cfg = json.load(open(os.path.join(OURS, "llama", "peft_config.json")))
    missing = [k for k in ref_cfg if k not in our_cfg and k not in TORCH_ONLY]
    assert not missing, f"llama/peft_config.json missing keys: {missing}"
    diff = {k: (our_cfg[k], ref_cfg[k]) for k in ref_cfg
            if k in our_cfg and our_cfg[k] != ref_cfg[k]}
    assert not diff, f"llama/peft_config.json value drift: {diff}"
