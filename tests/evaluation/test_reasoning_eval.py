"""Answer extraction + intervention-location parity with the reference
semantics, and a tiny end-to-end reasoning harness smoke."""

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)

from sparse_matrix_fine_tuning_tpu.data.reasoning import (
    get_intervention_locations,
    parse_positions,
)
from sparse_matrix_fine_tuning_tpu.evaluation import (
    extract_answer_letter,
    extract_answer_number,
    extract_output,
)


def test_extract_answer_number():
    assert extract_answer_number("The answer is 42.") == 42.0
    assert extract_answer_number("first 3 then 7.5") == 7.5
    assert extract_answer_number("1,234 total") == 1234.0
    assert extract_answer_number("-3 degrees") == -3.0
    assert extract_answer_number("no digits here") == float("inf")


def test_extract_answer_letter():
    assert extract_answer_letter("the correct answer is B") == "B"
    # reference semantics: FIRST capital A-E anywhere -- "Answer" hits 'A'
    # (reference compute_metrics.py:49-68 notes this ambiguity explicitly)
    assert extract_answer_letter("Answer: (C) because...") == "A"
    assert extract_answer_letter("the option is (C)") == "C"
    assert extract_answer_letter("nothing lowercase") == ""


def test_extract_output_trigger():
    assert extract_output("prompt ### Response: hello world", "### Response:") == "hello world"
    assert extract_output("no trigger present", "### Response:") == ""
    assert extract_output("keep all", "") == "keep all"


def test_parse_positions():
    assert parse_positions("f7+l7") == (7, 7)
    assert parse_positions("f5") == (5, 0)
    assert parse_positions("l3") == (0, 3)


def test_intervention_locations_shared():
    # prompt of 20 tokens, f7+l7, shared weights, 4 interventions
    locs = get_intervention_locations(last_position=20, first_n=7, last_n=7,
                                      num_interventions=4, share_weights=True)
    assert len(locs) == 4
    assert locs[0] == list(range(7)) + list(range(13, 20))


def test_intervention_locations_short_prompt_padded():
    # prompt of 6: first/last capped at 3 each, padding fills to 7+7
    locs = get_intervention_locations(last_position=6, first_n=7, last_n=7,
                                      num_interventions=2, share_weights=True,
                                      pad_mode="first")
    row = locs[0]
    assert row[:3] == [0, 1, 2]
    assert row[3:6] == [3, 4, 5]
    assert all(p == -1 for p in row[6:])
    assert len(row) == 14


def test_intervention_locations_split_weights():
    locs = get_intervention_locations(last_position=20, first_n=4, last_n=4,
                                      num_interventions=4, share_weights=False)
    assert locs[0] == [0, 1, 2, 3]
    assert locs[2] == [16, 17, 18, 19]


def test_reasoning_harness_smoke(tmp_path):
    import run_reasoning
    argv = ["run_reasoning.py", "-task", "math", "--smoke=True",
            "-e", "6", "-lr", "0.005", "-batch_size", "8",
            "-gradient_accumulation_steps", "1", "--logging_steps=0",
            "--max_length=64", f"--output_dir={tmp_path}",
            "--max_n_eval_example=16"]
    old = sys.argv
    sys.argv = argv
    try:
        results = run_reasoning.main()
    finally:
        sys.argv = old
    assert "eval/average" in results
    assert 0.0 <= results["eval/average"] <= 1.0
    assert os.path.exists(os.path.join(str(tmp_path), "math", "eval_results.json"))
    assert os.path.exists(os.path.join(str(tmp_path), "math", "generations.json"))


def test_synthetic_datasets_distinct_per_name():
    """Smoke-mode eval data must differ per dataset so the multi-dataset
    eval loop is actually exercised (round 1 reported identical accuracy
    for all 7 math datasets)."""
    from sparse_matrix_fine_tuning_tpu.data.reasoning import load_data_items
    names = ["gsm8k", "SVAMP", "mawps", "AQuA"]
    sets = [load_data_items("math", n, "dataset", split="test", smoke=True)
            for n in names]
    for i in range(len(sets)):
        for j in range(i + 1, len(sets)):
            assert sets[i] != sets[j], (names[i], names[j])
