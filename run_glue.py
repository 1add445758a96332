"""GLUE fine-tuning harness (TPU-native).

Usage (mirrors the reference CLI, reference run_glue.py:141-823):

  python run_glue.py task_configs/monarch_roberta_glue/cola.json \
      [--monarch=True] [--lora=False] [--do_tune=True] [--smoke=True] \
      [--any_config_key=value ...]

Pipeline: task JSON -> TrainingArgs/model args; peft_config.json from the
config dir; free-form CLI overrides; tokenize GLUE (HF datasets when
available, learnable synthetic data in zero-egress smoke mode); build
RoBERTa (pretrained local dir or random init), inject Monarch/LoRA
adapters; jit-train; evaluate (MNLI gets matched+mismatched); export GLUE
test-set TSV predictions; optional ASHA-style HPO with best-HP persistence.
"""

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))



def parse_args():
    p = argparse.ArgumentParser(description="Run GLUE (TPU-native MoRe)")
    p.add_argument("config_path", help="task config JSON path")
    p.add_argument("--monarch", default=True, type=eval)
    p.add_argument("--lora", default=False, type=eval)
    p.add_argument("--boft", default=False, type=eval)
    p.add_argument("--do_tune", default=False, type=eval)
    p.add_argument("--n_trials", default=None, type=int,
                   help="HPO trials; default = per-method reference budget "
                        "(monarch 25 -- train_utils.py:63; BOFT 15; full-FT "
                        "runs its fixed grid).  An explicit value overrides "
                        "the method budget.")
    p.add_argument("--parallel_trials", default=1, type=int,
                   help="concurrent trials per rung (Ray trial placement equiv.)")
    p.add_argument("--smoke", default=False, type=eval,
                   help="synthetic data + tiny model (no pretrained weights)")
    p.add_argument("--tune_blk_config", default=False, type=eval)
    p.add_argument("--tune_lr_scale", default=1.0, type=float,
                   help="multiply the HPO lr bounds (1.0 = reference "
                        "parity; the smoke corpus needs ~10x)")
    p.add_argument("--tune_grace", default=None, type=float,
                   help="override the per-task ASHA grace (min epochs "
                        "before a trial can be stopped)")
    p.add_argument("--as_base_hp", default=False, type=eval)
    p.add_argument("--resume", default=False, type=eval)
    p.add_argument("--profile", action="store_true")
    p.add_argument("--bf16_compute", default=False, type=eval)
    p.add_argument("--wandb", default=True, type=eval,
                   help="mirror metrics to wandb when available "
                        "(metrics.jsonl is always written)")
    p.add_argument("--group", default="", help="extra run-group component")
    p.add_argument("--notes", default="", help="notes folded into the group")
    p.add_argument("--project", default=None, help="wandb project override")
    p.add_argument("--time", default=None,
                   help="group timestamp override (joins an existing group)")
    p.add_argument("--load_group", default=False, type=eval,
                   help="rejoin the group in output_dir/full_group.txt")
    p.add_argument("--platform", default=None,
                   help="force a jax platform (e.g. cpu) before backend init")
    args, unknown = p.parse_known_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    return args, unknown


SMOKE_VOCAB = 1024  # smoke-mode tokenizer/model vocab (keeps tiny models learnable)


@dataclasses.dataclass
class DataArgs:
    task_name: str = "cola"
    model_name_or_path: str = "roberta-large"
    max_seq_length: int = 128
    do_train: bool = True
    do_eval: bool = True
    do_predict: bool = False


def build_model(data_args, peft_config, num_labels, smoke, use_monarch, use_lora,
                bf16=False, seed=0, use_boft=False):
    from flax import nnx
    from sparse_matrix_fine_tuning_tpu.models import (
        RobertaConfig, RobertaForSequenceClassification)
    from sparse_matrix_fine_tuning_tpu.peft import (
        init_boft, init_lora, init_monarch, param_stats)

    dtype = "bfloat16" if bf16 else None
    path = data_args.model_name_or_path
    is_deberta = "deberta" in path.lower()
    if not smoke and os.path.isdir(path):
        if is_deberta:
            from sparse_matrix_fine_tuning_tpu.models.hf_convert import from_pretrained_deberta
            model = from_pretrained_deberta(path, num_labels=num_labels, dtype=dtype,
                                            rngs=nnx.Rngs(seed))
        else:
            from sparse_matrix_fine_tuning_tpu.models.hf_convert import from_pretrained_roberta
            model = from_pretrained_roberta(path, num_labels=num_labels, dtype=dtype,
                                            rngs=nnx.Rngs(seed))
    elif is_deberta:
        from sparse_matrix_fine_tuning_tpu.models.deberta import (
            DebertaV2Config, DebertaV2ForSequenceClassification)
        if not smoke:
            print(f"[run_glue] no local weights at {path!r}; using random init")
        cfg = DebertaV2Config.tiny(num_labels=num_labels, dtype=dtype,
                                   vocab_size=SMOKE_VOCAB) if smoke             else DebertaV2Config(num_labels=num_labels, dtype=dtype)
        model = DebertaV2ForSequenceClassification(cfg, rngs=nnx.Rngs(seed))
    else:
        if not smoke:
            print(f"[run_glue] no local weights at {path!r}; using random init")
        if smoke:
            cfg = RobertaConfig.tiny(num_labels=num_labels, dtype=dtype,
                                     vocab_size=SMOKE_VOCAB)
        elif "large" in path:
            cfg = RobertaConfig.large(num_labels=num_labels, dtype=dtype)
        else:
            cfg = RobertaConfig.base(num_labels=num_labels, dtype=dtype)
        model = RobertaForSequenceClassification(cfg, rngs=nnx.Rngs(seed))
    if use_boft:
        adapted = init_boft(model, peft_config, rngs=nnx.Rngs(seed + 1))
        print(f"[run_glue] adapted {len(adapted)} layers with BOFT")
    elif use_monarch:
        adapted = init_monarch(model, peft_config, rngs=nnx.Rngs(seed + 1))
        for name, dense_shape, s1, s2 in adapted[:3]:
            print(f"Adapted {name} {dense_shape} -> {s1}, {s2}")
        print(f"[run_glue] adapted {len(adapted)} layers with Monarch")
    elif use_lora:
        init_lora(model, peft_config, rngs=nnx.Rngs(seed + 1))
    param_stats(model)
    return model


def glue_metrics_fn(task):
    from sparse_matrix_fine_tuning_tpu.evaluation import predict_classes
    from sparse_matrix_fine_tuning_tpu.utils.metrics import glue_compute

    def compute(model, data):
        # one jitted (state, ids, mask) -> logits per batch shape
        # (evaluation/predict.py; reference behavior = HF Trainer predict)
        preds = predict_classes(model, data)
        return glue_compute(task, preds, data["labels"])
    return compute


# GLUE leaderboard submission file names (reference run_glue.py:106-117)
TASK_TO_SUBMIT = {"cola": "CoLA", "sst2": "SST-2", "mrpc": "MRPC", "qqp": "QQP",
                  "stsb": "STS-B", "mnli": "MNLI-m", "mnli-mm": "MNLI-mm",
                  "qnli": "QNLI", "rte": "RTE", "wnli": "WNLI"}


def _glue_label_list(task):
    """Class-index -> label-string mapping pinned by the GLUE server
    (reference run_glue.py:321-325 + task_configs/labels.json)."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "task_configs", "labels.json")
    with open(path) as f:
        return json.load(f)[task]


def predict_tsv(model, data, task, out_dir, submit_task=None):
    """GLUE-server-format TSV export (reference run_glue.py:789-816):
    class indices map through the task label list; STS-B regression is
    formatted %3.3f; file named per the leaderboard convention."""
    from sparse_matrix_fine_tuning_tpu.evaluation import predict_classes
    is_regression = task == "stsb"
    preds = predict_classes(model, data)
    os.makedirs(out_dir, exist_ok=True)
    submit_task = submit_task or task
    label_list = None if is_regression else _glue_label_list(submit_task)
    path = os.path.join(out_dir, f"{TASK_TO_SUBMIT.get(submit_task, submit_task)}.tsv")
    with open(path, "w") as f:
        f.write("index\tprediction\n")
        for i, p in enumerate(preds):
            if is_regression:
                f.write(f"{i}\t{p:3.3f}\n")
            else:
                f.write(f"{i}\t{label_list[int(p)]}\n")
    print(f"[run_glue] wrote {path}")
    return path


def load_hpo_budget(task):
    """Per-task ASHA budget table (reference run_glue.py:637-646),
    externalised to task_configs/hpo_budgets.json."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "task_configs", "hpo_budgets.json")
    with open(path) as f:
        table = json.load(f)
    out = dict(table["default"])
    out.update(table.get(task, {}))
    return out


def build_search_space(args, peft_config, train_args):
    """Method-specific HPO spaces mirroring reference run_glue.py:595-636.

    Returns (space, n_trials): monarch = quantised-lr + batch choice with
    blk_r/nblocks pinned from peft_config (+NAS dims under
    --tune_blk_config, +10 trials); BOFT = lr-only, 15 trials; full
    fine-tuning = the reference's 3x2 lr/batch grid search.
    """
    from sparse_matrix_fine_tuning_tpu.training.hpo import (
        choice, grid, quniform)

    # --tune_lr_scale multiplies the lr bounds (default 1.0 = exact
    # reference-space parity).  The synthetic smoke corpus needs ~10x the
    # real-data lr to move in a compressed-epoch budget, so the committed
    # on-chip sweep artifact (scripts/run_hpo_cola_chip.sh) passes a
    # scale; real-data sweeps should not.
    s = getattr(args, "tune_lr_scale", 1.0)
    if args.boft:
        return ({"seed": train_args.seed,
                 "learning_rate": quniform(8e-5 * s, 8e-4 * s, 4e-5 * s)},
                args.n_trials or 15)
    if args.monarch:
        space = {
            "seed": train_args.seed,
            "learning_rate": quniform(1e-4 * s, 6.6e-4 * s, 2e-5 * s),
            "per_device_train_batch_size": choice([16, 32]),
            "weight_decay": train_args.weight_decay,
            "lr_scheduler_type": "cosine",
            "blk_r": peft_config.get("blk_r", 4),
            "nblocks": peft_config.get("nblocks", 4),
        }
        n_trials = args.n_trials or 25
        if args.tune_blk_config:
            # block-config NAS (reference run_glue.py:609-616)
            space["blk_r"] = choice([1, 2, 4, 8])
            space["blk_sz"] = choice([64, 128, 512])
            del space["nblocks"]  # blk_sz determines the block count
            if args.n_trials is None:  # explicit --n_trials is exact
                n_trials += 10
        return space, n_trials
    # vanilla fine-tuning (or LoRA): the reference's grid search
    return {
        "learning_rate": grid([1e-5, 2e-5, 3e-5]),
        "per_device_train_batch_size": grid([16, 32]),
        "weight_decay": 0.1,  # pinned (reference tunes only lr/batch here)
        "lr_scheduler_type": grid(["cosine"]),
    }, args.n_trials or 1


def main():
    args, overrides = parse_args()
    from sparse_matrix_fine_tuning_tpu.data.glue import (
        TASK_NUM_LABELS, load_glue_raw, tokenize_glue)
    from sparse_matrix_fine_tuning_tpu.data.tokenizer import get_tokenizer
    from sparse_matrix_fine_tuning_tpu.training import Trainer, TrainingArgs
    from sparse_matrix_fine_tuning_tpu.training.hpo import hyperparameter_search
    from sparse_matrix_fine_tuning_tpu.utils.config import (
        load_best_hp, load_json, override_config, save_best_hp)
    from sparse_matrix_fine_tuning_tpu.utils.metrics import GLUE_TARGET_METRIC

    task_cfg = load_json(args.config_path)
    cfg_dir = os.path.dirname(args.config_path)
    peft_path = os.path.join(cfg_dir, "peft_config.json")
    peft_config = load_json(peft_path) if os.path.exists(peft_path) else {
        "monarch": True, "nblocks": 4, "blk_r": 4, "adapter": True,
        "target_modules": ["query", "value", "key"]}

    data_args = DataArgs(
        task_name=task_cfg.get("task_name", "cola"),
        model_name_or_path=task_cfg.get("model_name_or_path", "roberta-large"),
        max_seq_length=task_cfg.get("max_seq_length", 128),
        do_predict=task_cfg.get("do_predict", False))
    train_args = TrainingArgs(
        output_dir=task_cfg.get("output_dir", "results/glue"),
        learning_rate=task_cfg.get("learning_rate", 3e-5),
        num_train_epochs=task_cfg.get("num_train_epochs", 3),
        per_device_train_batch_size=task_cfg.get("per_device_train_batch_size", 16),
        weight_decay=task_cfg.get("weight_decay", 0.0),
        warmup_ratio=task_cfg.get("warmup_ratio", 0.06),
        lr_scheduler_type=task_cfg.get("lr_scheduler_type", "linear"),
        logging_steps=task_cfg.get("logging_steps", 100),
        eval_steps=task_cfg.get("eval_steps", 0),
        save_steps=task_cfg.get("save_steps", 0),
        save_total_limit=task_cfg.get("save_total_limit", 1),
        load_best_model_at_end=task_cfg.get("load_best_model_at_end", False),
        # TPU-native length grouping: GLUE sentences are short (CoLA ~10
        # tokens) but pad to max_seq_length; trimming batches to bucketed
        # maxima cuts most of that work (docs/BENCHMARKS.md)
        group_by_length=task_cfg.get("group_by_length", True),
        length_bucket=task_cfg.get("length_bucket", 32),
        seed=task_cfg.get("seed", 42))
    extra = override_config([data_args, train_args, peft_config], overrides)
    if extra:
        print(f"[run_glue] unmatched overrides: {extra}")
    if "oft_dropout" in task_cfg:
        # per-task BOFT dropout overrides the family peft_config value
        # (reference run_glue.py:414 wires model_args.oft_dropout into
        # peft_config["boft_dropout"])
        peft_config["boft_dropout"] = task_cfg["oft_dropout"]
    task = data_args.task_name
    train_args.output_dir = os.path.join(train_args.output_dir, task)
    train_args.metric_for_best_model = GLUE_TARGET_METRIC[task]
    train_args.greater_is_better = True
    train_args.use_scaler = bool(peft_config.get("scaler", False))
    train_args.large_lr = bool(peft_config.get("large_lr", False))
    train_args.new_lr = float(peft_config.get("new_lr", 5e-3))

    num_labels = TASK_NUM_LABELS[task]
    if args.smoke:
        from sparse_matrix_fine_tuning_tpu.data.tokenizer import SimpleTokenizer
        tokenizer = SimpleTokenizer(vocab_size=SMOKE_VOCAB)
    else:
        tokenizer = get_tokenizer(data_args.model_name_or_path)
    raw = load_glue_raw(task, smoke=args.smoke)
    data = tokenize_glue(task, raw, tokenizer, data_args.max_seq_length)
    val_key = "validation_matched" if task == "mnli" else "validation"

    from sparse_matrix_fine_tuning_tpu.utils.logging import (
        RunLogger, get_run_group, persist_run_group)
    run_group = persist_run_group(
        train_args.output_dir,
        get_run_group(task_name=task, do_tune=args.do_tune, group=args.group,
                      cur_time=args.time, notes=args.notes or None),
        resume=args.resume or args.load_group)

    def make_trainer(hp=None, epochs=None, logger=None):
        ta = dataclasses.replace(train_args)
        pc = dict(peft_config)
        if hp:
            override_config([ta, pc], hp)
        if epochs is not None:
            ta.num_train_epochs = epochs
        model = build_model(data_args, pc, num_labels, args.smoke,
                            args.monarch and not args.boft, args.lora,
                            bf16=args.bf16_compute, seed=ta.seed,
                            use_boft=args.boft)
        return Trainer(model, ta, train_data=data["train"],
                       eval_data=data[val_key],
                       compute_metrics=glue_metrics_fn(task), logger=logger)

    target = f"eval_{GLUE_TARGET_METRIC[task]}"

    if args.do_tune:
        space, n_trials = build_search_space(args, peft_config, train_args)
        budget = load_hpo_budget(task)
        # budget ceiling: reference ASHA max_t in eval-iteration units,
        # capped by the recipe's epochs; grace = min rung budget
        max_ep = min(float(budget["max_t"]), float(train_args.num_train_epochs))
        # --tune_grace overrides the per-task ASHA grace (epoch units);
        # the smoke corpus learns nothing before ~5 epochs, so the
        # committed on-chip sweep raises it (real-data sweeps keep the
        # reference budget's value)
        grace = getattr(args, "tune_grace", None) or budget["grace"]
        min_ep = min(float(grace), max_ep)

        def run_trial(hp, epochs, trial_id):
            # per-trial dir + resume: a survivor's next rung EXTENDS its
            # training from the last checkpoint instead of restarting
            # (Ray keeps per-trial checkpoints; round 1 re-ran from scratch)
            trial_dir = os.path.join(train_args.output_dir, f"trial_{trial_id}")
            hp = dict(hp, output_dir=trial_dir)
            t = make_trainer(hp, epochs)
            t.train(resume=True)
            return t.evaluate()

        import jax

        os.makedirs(train_args.output_dir, exist_ok=True)
        result = hyperparameter_search(
            run_trial, space, n_trials=n_trials, target_metric=target,
            mode="max", min_epochs=min_ep, max_epochs=max_ep,
            parallel_trials=args.parallel_trials,
            # concurrent trials pinned round-robin to the host's devices
            # (real parallelism on multi-device hosts; no-op on one chip)
            devices=jax.devices() if args.parallel_trials > 1 else None,
            state_path=os.path.join(train_args.output_dir, "hpo_state.jsonl")
            if args.resume else None)
        best = result["best_hyperparams"]
        save_best_hp(best, train_args.output_dir,
                     cfg_dir if args.as_base_hp else None)
        print(json.dumps({"best_hyperparams": best,
                          "best_metric": result["best_metric"]}))
        hp = best
    else:
        hp = load_best_hp(train_args.output_dir, cfg_dir)

    # metrics.jsonl (+wandb when available) with reference-style run grouping
    # and adapter-layer watching (reference train_utils.py:235-247, 521-549)
    logger = RunLogger(train_args.output_dir, group=run_group,
                       name=f"{task}_final", project=args.project,
                       use_wandb=args.wandb,
                       config={"task": task, "peft_config": peft_config,
                               "hp": hp or {}})
    trainer = make_trainer(hp, logger=logger)
    from sparse_matrix_fine_tuning_tpu.utils.logging import watch_layers
    watch_layers(trainer.model, logger)
    if args.profile:
        import jax
        jax.profiler.start_trace(os.path.join(train_args.output_dir, "profile"))
    metrics = trainer.train(resume=args.resume)
    if args.profile:
        import jax
        jax.profiler.stop_trace()
    logger.log({"step": trainer.step, **metrics})
    watch_layers(trainer.model, logger)
    logger.finish()
    results = {f"{task}": metrics}
    if task == "mnli" and "validation_mismatched" in data:
        mm = trainer.evaluate(data["validation_mismatched"])
        results["mnli-mm"] = mm
    if data_args.do_predict:
        # MNLI double prediction: matched AND mismatched test splits
        # (reference run_glue.py:792-816)
        test_splits = [("test_matched", "mnli"), ("test_mismatched", "mnli-mm")] \
            if task == "mnli" else [("test", task)]
        for test_key, submit_task in test_splits:
            if test_key in data:
                predict_tsv(trainer.model, data[test_key], task,
                            os.path.join(train_args.output_dir, "predict"),
                            submit_task=submit_task)
    print(json.dumps(results))
    return results


if __name__ == "__main__":
    main()
