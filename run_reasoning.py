"""Reasoning / instruction fine-tuning harness (commonsense, math, gsm8k, alpaca).

TPU-native equivalent of the reference's loreft training script
(reference pyreft/loreft/train.py:71-743):

  python run_reasoning.py -task math -model <local-llama-dir> \
      -p f7+l7 -e 12 -lr 5e-4 -batch_size 2 -gradient_accumulation_steps 16 \
      [--blk_r=8] [--all_linear=True] [--smoke=True] [--do_tune=True]

Builds Llama (local HF checkpoint or a tiny random model in smoke mode),
injects Monarch adapters over the attention+MLP projections, trains with
the masked causal-LM loss, then runs generation-based exact-match eval over
every eval dataset of the task (greedy or beam-4, reference
compute_metrics.py:99-267).
"""

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SMOKE_VOCAB = 1024


def parse_args():
    p = argparse.ArgumentParser(description="Reasoning fine-tuning (TPU-native MoRe)")
    p.add_argument("-task", "--task", default="math",
                   choices=["commonsense", "math", "alpaca", "gsm8k",
                            "instruct", "ultrafeedback", "glue",
                            "tune_math", "tune_commonsense"])
    p.add_argument("-model", "--model", default="llama-2-7b")
    p.add_argument("-data_dir", "--data_dir", default="dataset")
    p.add_argument("-seed", "--seed", default=42, type=int)
    p.add_argument("-p", "--position", default="f7+l7")
    p.add_argument("-e", "--epochs", default=3.0, type=float)
    p.add_argument("-lr", "--lr", default=5e-4, type=float)
    p.add_argument("-batch_size", "--batch_size", default=2, type=int)
    p.add_argument("-eval_batch_size", "--eval_batch_size", default=8, type=int)
    p.add_argument("-gradient_accumulation_steps", "--gradient_accumulation_steps",
                   default=16, type=int)
    p.add_argument("-max_length", "--max_length", default=512, type=int)
    p.add_argument("-max_n_train_example", "--max_n_train_example", default=None, type=int)
    p.add_argument("-max_n_eval_example", "--max_n_eval_example", default=None, type=int)
    p.add_argument("--schedule", default="linear")
    p.add_argument("--warmup_ratio", default=0.06, type=float)
    p.add_argument("--weight_decay", default=0.0, type=float)
    p.add_argument("--dropout", default=None, type=float)
    p.add_argument("--greedy_decoding", default=True, type=eval)
    p.add_argument("--intervention_type", default="Nothing",
                   help="ReFT intervention: Nothing | LoreftIntervention | "
                        "NoreftIntervention | ConsreftIntervention | MoReIntervention")
    p.add_argument("-l", "--layers", default="all",
                   help="intervention layers: 'all' or semicolon ints, e.g. 3;9;18")
    p.add_argument("-rank", "--rank", default=4, type=int,
                   help="intervention low-rank dimension")
    p.add_argument("-sw", "--share_weights", nargs="?", const=True,
                   default=False, type=eval,
                   help="tie the first-n and last-n position interventions "
                        "(bare -sw works like the reference's store_true; "
                        "False doubles the intervention count for f+l)")
    p.add_argument("-train_dataset", "--train_dataset", default=None,
                   help="override the task's default train dataset")
    p.add_argument("-eval_dataset", "--eval_dataset", default=None,
                   help="restrict eval to one dataset (default: all of the "
                        "task's eval datasets)")
    p.add_argument("-test_split", "--test_split", default="test")
    p.add_argument("-allow_cls_grad", "--allow_cls_grad", action="store_true",
                   help="glue task: unfreeze the classification head "
                        "(reference loreft/train.py:182)")
    p.add_argument("--metric_for_best_model", default=None,
                   help="glue task: reported target metric (defaults to the "
                        "task's GLUE metric)")
    p.add_argument("-t", "--temperature", default=None, type=float)
    p.add_argument("-top_p", "--top_p", default=None, type=float)
    p.add_argument("-top_k", "--top_k", default=None, type=int)
    p.add_argument("--max_steps", default=-1, type=int)
    p.add_argument("--all_linear", default=True, type=eval)
    p.add_argument("--pack", default=False, type=eval,
                   help="sequence packing of training rows (segment-masked "
                        "attention; incompatible with ReFT interventions)")
    p.add_argument("--do_tune", default=False, type=eval)
    p.add_argument("--parallel_trials", default=1, type=int)
    p.add_argument("--n_trials", default=6, type=int)
    p.add_argument("--gradient_checkpointing", default=True, type=eval,
                   help="remat decoder layers (the reference's 7B default)")
    p.add_argument("--remat_policy", default="nothing",
                   choices=["nothing", "dots"],
                   help="what remat saves: 'nothing' = full recompute "
                        "(minimum memory); 'dots' = keep matmul outputs "
                        "(faster when memory allows)")
    p.add_argument("--loss_chunk", default=0, type=int,
                   help="compute the CE loss in token chunks of this size "
                        "so full (B,T,V) logits are never materialised "
                        "(0 = off; 1024 is a good TPU value)")
    p.add_argument("--smoke", default=False, type=eval)
    p.add_argument("--output_dir", default="results/reasoning")
    p.add_argument("--logging_steps", default=10, type=int)
    p.add_argument("--profile", action="store_true",
                   help="jax.profiler trace of the training run")
    p.add_argument("--platform", default=None)
    p.add_argument("--mesh_fsdp", default=0, type=int,
                   help="FSDP-shard the frozen base over this many devices")
    args, unknown = p.parse_known_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    return args, unknown


def build_model(args, peft_config):
    from flax import nnx
    from sparse_matrix_fine_tuning_tpu.models import LlamaConfig, LlamaForCausalLM
    from sparse_matrix_fine_tuning_tpu.peft import init_monarch, param_stats

    if not args.smoke and os.path.isdir(args.model):
        # model_type-routing: any supported causal-LM family (llama /
        # mistral / gemma / qwen2 / gpt2), like the reference's
        # AutoModelForCausalLM (loreft/train.py:116)
        from sparse_matrix_fine_tuning_tpu.models.hf_convert import (
            from_pretrained_causal_lm)
        model = from_pretrained_causal_lm(args.model, dtype="bfloat16",
                                          remat=args.gradient_checkpointing,
                                          remat_policy=args.remat_policy,
                                          rngs=nnx.Rngs(args.seed))
    else:
        if not args.smoke:
            print(f"[reasoning] no local weights at {args.model!r}; random tiny init")
        cfg = LlamaConfig.tiny(vocab_size=SMOKE_VOCAB, hidden_size=128,
                               num_hidden_layers=2, num_attention_heads=4,
                               num_key_value_heads=2, intermediate_size=256,
                               max_position_embeddings=1024)
        model = LlamaForCausalLM(cfg, rngs=nnx.Rngs(args.seed))
    if not args.all_linear:
        from sparse_matrix_fine_tuning_tpu.models.gpt2 import GPT2LMHeadModel
        attn_targets = (["c_attn"] if isinstance(model, GPT2LMHeadModel)
                        else ["q_proj", "k_proj", "v_proj", "o_proj"])
        peft_config = dict(peft_config, target_modules=attn_targets)
    adapted = init_monarch(model, peft_config, rngs=nnx.Rngs(args.seed + 1))
    print(f"[reasoning] adapted {len(adapted)} layers with Monarch")
    if args.intervention_type not in ("Nothing", "NoIntervention"):
        # ReFT wrapper: block-output interventions at the chosen layers
        # (the production MoRe path passes Nothing -- math_monarch.sh:28)
        from sparse_matrix_fine_tuning_tpu.interventions import ReftConfig, get_reft_model
        layers, reps = _build_reft_reps(args, model.config.num_hidden_layers,
                                        args.intervention_type)
        model = get_reft_model(model, ReftConfig(representations=reps),
                               rngs=nnx.Rngs(args.seed + 2))
        print(f"[reasoning] ReFT {args.intervention_type} on layers {layers}")
    if getattr(args, "loss_chunk", 0) and hasattr(model, "config"):
        import dataclasses as _dc
        model.config = _dc.replace(model.config, loss_chunk=args.loss_chunk)
    param_stats(model)
    return model


def _build_reft_reps(args, n_model_layers: int, intervention_type: str):
    """(layers, representation dicts) for the ReFT wrapper: parse the
    layer list, double it for untied f+l positions (reference
    loreft/train.py:304-305; locations emit left-half then right-half in
    the same order), and carry the dropout into each intervention
    (reference train.py:147,166)."""
    layers = (list(range(n_model_layers)) if args.layers == "all"
              else [int(x) for x in str(args.layers).split(";")])
    if "+" in args.position and not args.share_weights:
        layers = layers + layers
    reps = [{"layer": l, "component": "block_output",
             "intervention": intervention_type,
             "low_rank_dimension": args.rank,
             "dropout": args.dropout or 0.0} for l in layers]
    return layers, reps


def moreft_glue_main(args, peft_config):
    """Sequence classification through the ReFT wrapper (MoReFT GLUE,
    reference moreft_glue.sh: train.py -task glue -train_dataset cola
    -type MoReIntervention -p f1 --allow_cls_grad).  The intervention IS
    the adapter here -- no Monarch surgery on the base model."""
    import numpy as np
    from flax import nnx
    from sparse_matrix_fine_tuning_tpu.data.glue import (
        TASK_NUM_LABELS, load_glue_raw)
    from sparse_matrix_fine_tuning_tpu.data.reasoning import tokenize_glue_reft
    from sparse_matrix_fine_tuning_tpu.data.tokenizer import (
        SimpleTokenizer, get_tokenizer)
    from sparse_matrix_fine_tuning_tpu.evaluation.predict import predict_classes
    from sparse_matrix_fine_tuning_tpu.interventions import (
        ReftConfig, get_reft_model)
    from sparse_matrix_fine_tuning_tpu.models import (
        RobertaConfig, RobertaForSequenceClassification)
    from sparse_matrix_fine_tuning_tpu.peft import param_stats
    from sparse_matrix_fine_tuning_tpu.training import Trainer, TrainingArgs
    from sparse_matrix_fine_tuning_tpu.utils.metrics import (
        GLUE_TARGET_METRIC, glue_compute)

    task = args.train_dataset or "cola"
    out_dir = os.path.join(args.output_dir, f"glue_{task}")
    num_labels = TASK_NUM_LABELS[task]
    tokenizer = (SimpleTokenizer(vocab_size=SMOKE_VOCAB) if args.smoke
                 else get_tokenizer(args.model, vocab_size=50265))

    if not args.smoke and os.path.isdir(args.model):
        from sparse_matrix_fine_tuning_tpu.models.hf_convert import (
            from_pretrained_roberta)
        model = from_pretrained_roberta(args.model, num_labels=num_labels,
                                        rngs=nnx.Rngs(args.seed))
    else:
        if not args.smoke:
            print(f"[moreft-glue] no local weights at {args.model!r}; "
                  "random tiny init")
        # vocab must cover the tokenizer's id range: ids past the embedding
        # table would silently clip to the last row (degenerate training)
        cfg = RobertaConfig.tiny(num_labels=num_labels,
                                 vocab_size=tokenizer.vocab_size)
        model = RobertaForSequenceClassification(cfg, rngs=nnx.Rngs(args.seed))

    itype = args.intervention_type
    if itype in ("Nothing", "NoIntervention"):
        # the intervention carries the adaptation in this flow
        itype = "MoReIntervention"
    layers, reps = _build_reft_reps(args, model.config.num_hidden_layers,
                                    itype)
    model = get_reft_model(model, ReftConfig(representations=reps),
                           rngs=nnx.Rngs(args.seed + 2))
    print(f"[moreft-glue] {itype} on layers {layers} ({task})")
    param_stats(model)

    splits = load_glue_raw(task, smoke=args.smoke)
    data = tokenize_glue_reft(
        task, splits, tokenizer, position=args.position,
        num_interventions=len(layers), share_weights=args.share_weights,
        max_seq_length=args.max_length)
    train_data = data["train"]
    # MNLI names its splits validation_matched/mismatched (run_glue.py does
    # the same matched-split defaulting)
    eval_split = ("validation_matched" if task == "mnli" else "validation")
    if eval_split not in data:
        eval_split = args.test_split
    val = data.get(eval_split)

    def cls_loss(model, batch, train):
        logits = model(batch["input_ids"],
                       attention_mask=batch["attention_mask"],
                       intervention_locations=batch["intervention_locations"])
        return model.loss(logits, batch["labels"], weights=batch.get("_valid"))

    ta = TrainingArgs(
        output_dir=out_dir, learning_rate=args.lr,
        num_train_epochs=args.epochs,
        per_device_train_batch_size=args.batch_size,
        per_device_eval_batch_size=args.eval_batch_size,
        gradient_accumulation_steps=args.gradient_accumulation_steps,
        weight_decay=args.weight_decay, warmup_ratio=args.warmup_ratio,
        lr_scheduler_type=args.schedule, logging_steps=args.logging_steps,
        max_steps=args.max_steps, log_param_steps=0, seed=args.seed)
    trainer = Trainer(
        model, ta, train_data=train_data, loss_fn=cls_loss,
        extra_trainable_paths=("classifier",) if args.allow_cls_grad else ())
    trainer.train()

    metrics = {}
    if val is not None:
        preds = predict_classes(model, val, batch_size=args.eval_batch_size,
                                locations=val["intervention_locations"])
        metrics = glue_compute(task, preds, np.asarray(val["labels"]))
        target = args.metric_for_best_model or GLUE_TARGET_METRIC[task]
        print(json.dumps({f"eval_{k}": round(float(v), 5)
                          for k, v in metrics.items()} | {"target": target}))
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "metrics.json"), "w") as f:
        json.dump(metrics, f)
    return metrics


def main():
    args, overrides = parse_args()
    import numpy as np
    from sparse_matrix_fine_tuning_tpu.data.reasoning import (
        TASK_CONFIG, load_data_items, tokenize_reasoning)
    from sparse_matrix_fine_tuning_tpu.data.tokenizer import SimpleTokenizer, get_tokenizer
    from sparse_matrix_fine_tuning_tpu.evaluation import compute_reasoning_metrics
    from sparse_matrix_fine_tuning_tpu.training import Trainer, TrainingArgs
    from sparse_matrix_fine_tuning_tpu.training.hpo import (
        choice, hyperparameter_search, loguniform)
    from sparse_matrix_fine_tuning_tpu.utils.config import (
        load_best_hp, load_json, override_config, save_best_hp)

    peft_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "task_configs", "llama", "peft_config.json")
    peft_config = load_json(peft_path)
    if args.dropout is not None:
        peft_config["dropout"] = args.dropout
    extra = override_config([peft_config, args], overrides)
    if extra:
        print(f"[reasoning] unmatched overrides: {extra}")

    if args.task == "glue":
        return moreft_glue_main(args, peft_config)

    task = args.task
    tcfg = TASK_CONFIG[task]
    out_dir = os.path.join(args.output_dir, task)

    if args.smoke:
        tokenizer = SimpleTokenizer(vocab_size=SMOKE_VOCAB)
    else:
        tokenizer = get_tokenizer(args.model, vocab_size=32000)

    use_reft = args.intervention_type not in ("Nothing", "NoIntervention")
    # interventions per example: one per layer, doubled for untied f+l
    # positions (reference passes num_interventions=len(layers) after its
    # layer-doubling, train.py:304-319).  Layer count comes from the
    # actual checkpoint config (NOT a hardcoded 32: a 13B has 40 layers
    # and the tokenized locations must match build_model's reps)
    if not args.smoke and os.path.isdir(args.model):
        with open(os.path.join(args.model, "config.json")) as f:
            n_model_layers = json.load(f)["num_hidden_layers"]
    else:
        n_model_layers = 2  # the smoke/random tiny model in build_model
    n_layers = (n_model_layers if args.layers == "all"
                else len(str(args.layers).split(";")))
    if "+" in args.position and not args.share_weights:
        n_layers *= 2
    tok_kw = dict(position=args.position, share_weights=args.share_weights,
                  num_interventions=n_layers if use_reft else 1)
    train_items = load_data_items(
        task, args.train_dataset or tcfg["train_datasets"][0], args.data_dir,
        split="train", max_n_example=args.max_n_train_example,
        seed=args.seed, smoke=args.smoke)
    train_data = tokenize_reasoning(task, train_items, tokenizer,
                                    max_length=args.max_length, split="train",
                                    **tok_kw)
    keep_cols = ("input_ids", "attention_mask", "labels") + (
        ("intervention_locations",) if use_reft else ())
    train_data = {k: v for k, v in train_data.items() if k in keep_cols}
    if args.pack:
        if use_reft:
            raise SystemExit("--pack is incompatible with ReFT interventions "
                             "(position bookkeeping assumes unpacked rows); "
                             "use --intervention_type Nothing")
        from sparse_matrix_fine_tuning_tpu.data.alpaca import pack_tokenized
        n_before = len(train_data["input_ids"])
        train_data, eff = pack_tokenized(train_data, args.max_length)
        print(f"[reasoning] packed {n_before} examples into "
              f"{len(train_data['input_ids'])} rows ({eff:.0%} token efficiency)")

    def lm_loss(model, batch, train):
        kw = {}
        if "intervention_locations" in batch:
            kw["intervention_locations"] = batch["intervention_locations"]
        if "segment_ids" in batch:
            kw["segment_ids"] = batch["segment_ids"]
        if "intervention_locations" not in batch and hasattr(model, "training_loss"):
            # fused forward+CE; chunked (never materialises full logits)
            # when --loss_chunk > 0.  ReFT models route through their own
            # intervened forward instead.
            return model.training_loss(
                batch["input_ids"], batch["labels"],
                attention_mask=batch["attention_mask"],
                segment_ids=batch.get("segment_ids"),
                weights=batch.get("_valid"))
        logits = model(batch["input_ids"], attention_mask=batch["attention_mask"], **kw)
        return model.loss(logits, batch["labels"], weights=batch.get("_valid"))

    def make_trainer(hp=None, epochs=None, logger=None):
        pc = dict(peft_config)
        ta = TrainingArgs(
            output_dir=out_dir, learning_rate=args.lr,
            num_train_epochs=epochs if epochs is not None else args.epochs,
            per_device_train_batch_size=args.batch_size,
            per_device_eval_batch_size=args.eval_batch_size,
            gradient_accumulation_steps=args.gradient_accumulation_steps,
            weight_decay=args.weight_decay, warmup_ratio=args.warmup_ratio,
            lr_scheduler_type=args.schedule, logging_steps=args.logging_steps,
            max_steps=args.max_steps, log_param_steps=0, seed=args.seed)
        if hp:
            override_config([ta, pc], hp)
        model = build_model(args, pc)
        mesh = None
        if args.mesh_fsdp:
            from sparse_matrix_fine_tuning_tpu.parallel import make_mesh
            mesh = make_mesh(fsdp=args.mesh_fsdp)
        return Trainer(model, ta, train_data=train_data, loss_fn=lm_loss,
                       mesh=mesh, logger=logger)

    def eval_all(model, greedy=True, max_new=None, out=None):
        out = out or out_dir
        results = {}
        all_gen = []
        eval_sets = ([args.eval_dataset] if args.eval_dataset
                     else tcfg["eval_datasets"])
        for ds in eval_sets:
            items = load_data_items(task, ds, args.data_dir,
                                    split=args.test_split, is_eval=True,
                                    max_n_example=args.max_n_eval_example,
                                    seed=args.seed, smoke=args.smoke)
            eval_data = tokenize_reasoning(task, items, tokenizer,
                                           max_length=args.max_length,
                                           split="test", **tok_kw)
            gens, metrics = compute_reasoning_metrics(
                task, ds, model, tokenizer, eval_data, items,
                batch_size=args.eval_batch_size, greedy_decoding=greedy,
                max_new_tokens=max_new, temperature=args.temperature,
                top_p=args.top_p, top_k=args.top_k)
            results.update(metrics)
            all_gen.extend(gens)
        if results:
            results["eval/average"] = float(np.mean(list(results.values())))
        os.makedirs(out, exist_ok=True)
        with open(os.path.join(out, "generations.json"), "w") as f:
            json.dump(all_gen[:200], f, indent=1)
        return results

    smoke_new = 8 if args.smoke else None

    if args.do_tune:
        if task.replace("tune_", "") in ("alpaca", "instruct", "ultrafeedback"):
            raise SystemExit(
                f"--do_tune is meaningless for open-ended task {task!r}: it "
                "produces alpaca_eval generation dumps, not an EM metric, so "
                "every trial would tie at 'worst'.  Tune on tune_math / "
                "tune_commonsense, or the alpaca flow's MMLU metric via "
                "run_alpaca.py --do_tune (reference tunes qlora on "
                "eval_mmlu_eval_accuracy)")
        space = {"learning_rate": loguniform(5e-5, 1e-3),
                 "blk_r": choice([2, 4, 8]), "nblocks": choice([2, 4])}

        def run_trial(hp, epochs, trial_id):
            # per-trial dir: parallel trials must not share checkpoints /
            # generations; resume=True extends survivors across rungs
            trial_dir = os.path.join(out_dir, f"trial_{trial_id}")
            hp = dict(hp, output_dir=trial_dir)
            t = make_trainer(hp, epochs)
            t.train(resume=True)
            return eval_all(t.model, greedy=True, max_new=smoke_new,
                            out=trial_dir)

        import jax

        result = hyperparameter_search(
            run_trial, space, n_trials=args.n_trials, parallel_trials=args.parallel_trials,
            devices=jax.devices() if args.parallel_trials > 1 else None,
            target_metric="eval/average", mode="max",
            max_epochs=float(args.epochs))
        save_best_hp(result["best_hyperparams"], out_dir)
        hp = result["best_hyperparams"]
        print(json.dumps({"best_hyperparams": hp,
                          "best_metric": result["best_metric"]}))
    else:
        hp = load_best_hp(out_dir)

    from sparse_matrix_fine_tuning_tpu.utils.logging import (
        RunLogger, get_run_group, watch_layers)
    logger = RunLogger(out_dir, group=get_run_group(task_name=args.task,
                                                    do_tune=args.do_tune),
                       name=f"{args.task}_final",
                       config={"task": args.task, "hp": hp or {}})
    trainer = make_trainer(hp, logger=logger)
    watch_layers(trainer.model, logger)
    if args.profile:
        import jax
        jax.profiler.start_trace(os.path.join(out_dir, "profile"))
    trainer.train()
    if args.profile:
        import jax
        jax.profiler.stop_trace()
    results = eval_all(trainer.model, greedy=args.greedy_decoding,
                       max_new=smoke_new)
    # keys are already namespaced "eval/<dataset>" -- log them verbatim so
    # metrics.jsonl matches eval_results.json and the HPO target_metric
    logger.log({"step": trainer.step, **{k: v for k, v in results.items()
                                         if isinstance(v, (int, float))}})
    watch_layers(trainer.model, logger)
    logger.finish()
    print(json.dumps(results))
    with open(os.path.join(out_dir, "eval_results.json"), "w") as f:
        json.dump(results, f, indent=1)
    return results


if __name__ == "__main__":
    main()
