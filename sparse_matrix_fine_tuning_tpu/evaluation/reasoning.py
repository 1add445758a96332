"""Generation-based evaluation for the reasoning benchmarks.

Answer extraction reimplements the reference exactly (which itself follows
LLM-Adapters for fair comparison): last number for math, first A-E letter
for AQuA, trigger-token splitting of the raw decode
(reference pyreft/loreft/compute_metrics.py:21-98), and the exact-match
loop (:199-244).
"""

from __future__ import annotations

import re
from typing import Optional

import numpy as np

from sparse_matrix_fine_tuning_tpu.data.reasoning import TASK_CONFIG
from sparse_matrix_fine_tuning_tpu.models.generate import GenerationConfig, generate


def is_float(element) -> bool:
    if element is None:
        return False
    try:
        float(element)
        return True
    except ValueError:
        return False


def extract_answer_number(sentence: str) -> float:
    """Last number in the generation (reference compute_metrics.py:31-46)."""
    sentence = sentence.replace(",", "")
    pred = re.findall(r"-?\d+\.?\d*", sentence)
    if not pred:
        return float("inf")
    return float(pred[-1])


def extract_answer_letter(sentence: str) -> str:
    """First A-E letter (reference compute_metrics.py:49-68)."""
    pred = re.findall(r"A|B|C|D|E", sentence.strip())
    return pred[0] if pred else ""


def extract_output(pred: str, trigger: str = "") -> str:
    """Text after the last prompt trigger (reference compute_metrics.py:71-79)."""
    if not trigger:
        return pred
    start = pred.find(trigger)
    if start < 0:
        return ""
    return pred[start + len(trigger):].lstrip()


def score_generation(task: str, raw_generation: str, example: dict,
                     normalize=None) -> bool:
    """Exact-match scoring per task (reference compute_metrics.py:199-223)."""
    norm = normalize or (lambda x: x)
    if task in ("commonsense", "tune_commonsense"):
        return raw_generation.strip() == norm(example["answer"]).strip()
    if task in ("math", "tune_math"):
        answer = example["answer"].strip()
        if not is_float(answer):  # AQuA letters
            return extract_answer_letter(raw_generation).strip() == answer
        return abs(float(answer) - extract_answer_number(raw_generation)) <= 0.001
    if task == "gsm8k":
        answer = example["answer"].split("####")[-1].strip()
        gen = extract_answer_number(raw_generation)
        return abs(extract_answer_number(answer) - gen) <= 0.001
    raise ValueError(f"no EM scoring for task {task}")


def compute_reasoning_metrics(
    task: str,
    dataset_name: str,
    model,
    tokenizer,
    eval_data: dict,
    data_items: list,
    *,
    batch_size: int = 8,
    greedy_decoding: bool = True,
    temperature: Optional[float] = None,
    top_p: Optional[float] = None,
    top_k: Optional[int] = None,
    max_new_tokens: Optional[int] = None,
    rng=None,
):
    """Batched generate + extract + EM accuracy.

    eval_data: left-padded {input_ids, attention_mask, id} arrays.
    data_items: raw example dicts (for answers).
    Returns (generations, {"eval/<dataset>": accuracy}).
    """
    base_task = task.replace("tune_", "")
    tcfg = TASK_CONFIG[base_task]
    # normalise the trigger through the tokenizer so string matching works
    # for both real (invertible) and hash (smoke) tokenizers
    trigger = tokenizer.decode(tokenizer.encode_ids(tcfg["trigger_tokens"],
                                                    add_bos=False))
    gen_args = dict(tcfg["generation_args"][greedy_decoding])
    if temperature is not None:
        gen_args["temperature"] = temperature
    if top_p is not None:
        gen_args["top_p"] = top_p
    if top_k is not None:
        gen_args["top_k"] = top_k
    if max_new_tokens is not None:
        gen_args["max_new_tokens"] = max_new_tokens
    if "max_new_tokens" not in gen_args and "max_length" in gen_args:
        # alpaca pins a TOTAL-length budget (task_config.py:111 max_length
        # 2048, HF semantics: prompt + generation); convert to a new-token
        # budget against this eval set's prompt width
        prompt_len = int(np.asarray(eval_data["input_ids"]).shape[1])
        gen_args["max_new_tokens"] = max(1, gen_args["max_length"] - prompt_len)
    gc = GenerationConfig(
        max_new_tokens=gen_args.get("max_new_tokens", 32),
        num_beams=gen_args.get("num_beams", 1),
        do_sample=gen_args.get("do_sample", False),
        temperature=gen_args.get("temperature", 1.0),
        top_p=gen_args.get("top_p", 1.0),
        top_k=gen_args.get("top_k", 0),
        repetition_penalty=gen_args.get("repetition_penalty", 1.0),
        no_repeat_ngram_size=gen_args.get("no_repeat_ngram_size", 0),
        eos_token_id=tokenizer.eos_token_id,
        pad_token_id=tokenizer.pad_token_id,
    )
    ids = eval_data["input_ids"]
    mask = eval_data["attention_mask"]
    ex_ids = eval_data.get("id", np.arange(len(ids)))
    all_locs = eval_data.get("intervention_locations")
    is_reft = hasattr(model, "interventions") and all_locs is not None
    correct, total = 0, 0
    generations = []
    n = len(ids)
    for s in range(0, n, batch_size):
        batch_ids = ids[s:s + batch_size]
        batch_mask = mask[s:s + batch_size]
        if len(batch_ids) < batch_size:  # static shapes: pad the tail batch
            reps = batch_size - len(batch_ids)
            batch_ids = np.concatenate([batch_ids, np.repeat(batch_ids[-1:], reps, 0)])
            batch_mask = np.concatenate([batch_mask, np.repeat(batch_mask[-1:], reps, 0)])
        shifted = None
        if is_reft:
            # shift unpadded (sink-relative) positions by the left padding,
            # keeping -1 pads; repeat per beam for beam search.  Locations
            # are passed as a TRACED array so the compiled decode is reused
            # across batches (round-1 built per-batch hook closures, forcing
            # a full retrace+compile per eval batch).
            locs = all_locs[s:s + batch_size]
            if len(locs) < batch_size:
                locs = np.concatenate(
                    [locs, np.repeat(locs[-1:], batch_size - len(locs), 0)])
            lens = batch_mask.sum(axis=1)
            shift = (batch_ids.shape[1] - lens - 1)[:, None, None]
            shifted = np.where(locs >= 0, locs + shift, -1)
            if gc.num_beams > 1:
                shifted = np.repeat(shifted, gc.num_beams, axis=0)
        out = np.asarray(generate(model, batch_ids, batch_mask, gc, rng=rng,
                                  intervention_locations=shifted))
        new_tokens = out[:, ids.shape[1]:]
        for j in range(min(batch_size, n - s)):
            example = data_items[int(ex_ids[s + j])]
            text = tokenizer.decode(
                [t for t in out[j] if t != tokenizer.pad_token_id])
            raw_generation = extract_output(text, trigger)
            if base_task in ("alpaca", "instruct", "ultrafeedback"):
                # no EM for open-ended instruction tasks: dump generations
                # in alpaca_eval format for external judging (reference
                # compute_metrics.py:236-245)
                generations.append({
                    "instruction": example.get("instruction", ""),
                    "output": raw_generation,
                    "dataset": dataset_name,
                    "generator": f"{task}_model",
                })
                continue
            norm = (lambda a: tokenizer.decode(
                tokenizer.encode_ids(a, add_bos=False)))
            ok = score_generation(task, raw_generation, example, normalize=norm)
            correct += int(ok)
            total += 1
            generations.append({
                "instruction": example.get("instruction", example.get("question", "")),
                "raw_generation": raw_generation,
                "answer": example.get("answer", ""),
                "correct": bool(ok),
            })
    if base_task in ("alpaca", "instruct", "ultrafeedback"):
        # generations are the artifact; no accuracy is defined
        return generations, {}
    acc = correct / max(total, 1)
    return generations, {f"eval/{dataset_name}": acc}
