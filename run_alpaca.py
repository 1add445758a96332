"""Instruction tuning on Alpaca-style data with 5-shot MMLU evaluation.

TPU-native equivalent of the reference's qlora harness
(reference qlora/qlora_monarch.py:202-865).  Note the reference fork runs
the base model in bf16 -- its 4-bit quantization is commented out
(qlora/qlora.py:294-302); here ``--bits 8|4`` actually quantizes the frozen
base (see sparse_matrix_fine_tuning_tpu/quant) while adapters stay bf16.

  python run_alpaca.py -model <local-llama-dir> [--dataset alpaca] \
      [--bits 16|8|4] [--do_mmlu_eval=True] [--smoke=True]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SMOKE_VOCAB = 1024


def parse_args():
    p = argparse.ArgumentParser(description="Alpaca + MMLU (TPU-native MoRe)")
    p.add_argument("-model", "--model", default="llama-2-7b")
    p.add_argument("--dataset", default="alpaca",
                   choices=["alpaca", "chip2", "self-instruct", "hh-rlhf", "oasst1"])
    p.add_argument("--dataset_format", default=None,
                   choices=[None, "alpaca", "alpaca-clean", "chip2",
                            "self-instruct", "hh-rlhf", "oasst1",
                            "input-output"])
    p.add_argument("-data_dir", "--data_dir", default="dataset")
    p.add_argument("--bits", default=16, type=int, choices=[16, 8, 4])
    p.add_argument("--quant_lm_head", default=False, type=eval,
                   help="also int8-quantize the (frozen, untied) lm_head; "
                        "OFF by default like bitsandbytes' "
                        "llm_int8_skip_modules=['lm_head'] that the "
                        "reference qlora flow inherits")
    p.add_argument("--adapter", default="monarch", choices=["monarch", "lora"],
                   help="monarch (qlora_monarch.py flow) or lora (qlora.py baseline)")
    p.add_argument("-seed", "--seed", default=42, type=int)
    p.add_argument("-e", "--epochs", default=1.0, type=float)
    p.add_argument("-lr", "--lr", default=5.4e-4, type=float)
    p.add_argument("-batch_size", "--batch_size", default=4, type=int)
    p.add_argument("-gradient_accumulation_steps", "--gradient_accumulation_steps",
                   default=16, type=int)
    p.add_argument("--source_max_len", default=1024, type=int)
    p.add_argument("--target_max_len", default=256, type=int)
    p.add_argument("--train_on_source", default=False, type=eval,
                   help="compute loss on the prompt too (reference qlora flag)")
    p.add_argument("--group_by_length", default=True, type=eval,
                   help="co-batch similar lengths and trim the time axis to "
                        "bucketed maxima (reference qlora default)")
    p.add_argument("--pack", default=False, type=eval,
                   help="sequence packing: bin-pack examples into full rows "
                        "with segment-masked attention (TPU-native; beats "
                        "group_by_length on short-example mixes)")
    p.add_argument("--pack_max_len", default=None, type=int,
                   help="packed row length (default source+target max len)")
    p.add_argument("--do_eval", default=True, type=eval)
    p.add_argument("--eval_dataset_size", default=1024, type=int,
                   help="held-out examples for eval loss (reference qlora.py)")
    p.add_argument("--do_mmlu_eval", default=True, type=eval)
    p.add_argument("--mmlu_kshot", default=5, type=int)
    p.add_argument("--do_predict", default=False, type=eval,
                   help="generate continuations for the eval split and "
                        "write predictions.jsonl (reference qlora.py:848-856)")
    p.add_argument("--max_new_tokens", default=256, type=int)
    p.add_argument("--do_tune", default=False, type=eval)
    p.add_argument("--parallel_trials", default=1, type=int)
    p.add_argument("--n_trials", default=4, type=int)
    p.add_argument("--mmlu_split", default="eval", choices=["eval", "test"],
                   help="which MMLU split the callback scores (reference "
                        "qlora mmlu_split)")
    p.add_argument("--max_mmlu_samples", default=None, type=int)
    p.add_argument("--max_eval_samples", default=None, type=int)
    p.add_argument("--optim", default="adamw", choices=["adamw", "adamw8bit"],
                   help="adamw8bit = int8 optimizer moments, embeddings "
                        "fp32 (reference bitsandbytes Adam8bit + override)")
    p.add_argument("--weight_decay", default=0.0, type=float)
    p.add_argument("--warmup_ratio", default=0.03, type=float)
    p.add_argument("--lr_scheduler_type", default="constant")
    p.add_argument("--max_grad_norm", default=0.3, type=float,
                   help="reference qlora default 0.3")
    p.add_argument("--max_steps", default=-1, type=int)
    p.add_argument("--save_steps", default=0, type=int)
    p.add_argument("--save_total_limit", default=1, type=int)
    p.add_argument("--resume", default=False, type=eval)
    p.add_argument("--gradient_checkpointing", default=True, type=eval,
                   help="remat decoder layers (reference qlora default)")
    p.add_argument("--remat_policy", default="nothing",
                   choices=["nothing", "dots"],
                   help="what remat saves: 'nothing' = full recompute "
                        "(minimum memory, the single-chip 7B choice); "
                        "'dots' = keep matmul outputs, recompute only "
                        "elementwise work (faster when memory allows)")
    p.add_argument("--loss_chunk", default=0, type=int,
                   help="compute the CE loss in token chunks of this size "
                        "so full (B,T,V) logits are never materialised "
                        "(0 = off; 1024 is a good TPU value)")
    p.add_argument("--temperature", default=None, type=float)
    p.add_argument("--top_p", default=None, type=float)
    p.add_argument("--top_k", default=None, type=int)
    p.add_argument("--num_beams", default=1, type=int)
    p.add_argument("--do_sample", default=False, type=eval)
    p.add_argument("--repetition_penalty", default=1.0, type=float)
    p.add_argument("--no_repeat_ngram_size", default=0, type=int)
    p.add_argument("--smoke", default=False, type=eval)
    p.add_argument("--output_dir", default="results/alpaca")
    p.add_argument("--logging_steps", default=10, type=int)
    p.add_argument("--max_n_train_example", default=None, type=int)
    p.add_argument("--profile", action="store_true",
                   help="jax.profiler trace of the training run")
    p.add_argument("--platform", default=None)
    args, unknown = p.parse_known_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    return args, unknown


def build_model(args, peft_config):
    from flax import nnx
    from sparse_matrix_fine_tuning_tpu.models import LlamaConfig, LlamaForCausalLM
    from sparse_matrix_fine_tuning_tpu.peft import (
        find_all_linear_names, init_lora, init_monarch, param_stats)

    if not args.smoke and os.path.isdir(args.model):
        # model_type-routing: any supported causal-LM family (the
        # reference's AutoModelForCausalLM slot, qlora_monarch.py:231)
        from sparse_matrix_fine_tuning_tpu.models.hf_convert import (
            from_pretrained_causal_lm)
        model = from_pretrained_causal_lm(args.model, dtype="bfloat16",
                                          remat=args.gradient_checkpointing,
                                          remat_policy=args.remat_policy,
                                          rngs=nnx.Rngs(args.seed))
    else:
        if not args.smoke:
            print(f"[alpaca] no local weights at {args.model!r}; random tiny init")
        cfg = LlamaConfig.tiny(vocab_size=SMOKE_VOCAB, hidden_size=128,
                               num_hidden_layers=2, num_attention_heads=4,
                               num_key_value_heads=2, intermediate_size=256,
                               max_position_embeddings=2048)
        model = LlamaForCausalLM(cfg, rngs=nnx.Rngs(args.seed))
    # reference targets every linear (find_all_linear_names,
    # qlora_monarch.py:245-248)
    peft_config = dict(peft_config, target_modules=find_all_linear_names(model))
    if args.adapter == "lora":
        adapted = init_lora(model, dict(peft_config, r=peft_config.get("blk_r", 8) * 4),
                            rngs=nnx.Rngs(args.seed + 1))
        print(f"[alpaca] adapted {len(adapted)} layers with LoRA (qlora baseline)")
    else:
        adapted = init_monarch(model, peft_config, rngs=nnx.Rngs(args.seed + 1))
        print(f"[alpaca] adapted {len(adapted)} layers with Monarch")
    if args.bits in (4, 8):
        from sparse_matrix_fine_tuning_tpu.quant import quantize_frozen_base
        n = quantize_frozen_base(model, bits=args.bits)
        print(f"[alpaca] quantized {n} frozen base matrices to int{args.bits}")
    if args.quant_lm_head:
        from sparse_matrix_fine_tuning_tpu.quant import quantize_lm_head
        if quantize_lm_head(model):
            print("[alpaca] quantized lm_head to int8")
    if getattr(args, "loss_chunk", 0):
        import dataclasses as _dc
        model.config = _dc.replace(model.config, loss_chunk=args.loss_chunk)
    param_stats(model)
    return model


def predict_generations(model, tokenizer, eval_items, args, out_dir, *,
                        src_len, collate_causal_lm):
    """Generate continuations for the eval split and write
    ``predictions.jsonl`` -- each row is the source example plus
    ``prediction_with_input`` (full decoded sequence) and ``prediction``
    (continuation only), mirroring reference qlora.py:844-856."""
    import numpy as np
    from sparse_matrix_fine_tuning_tpu.models.generate import (
        GenerationConfig, generate)

    batch_data = collate_causal_lm(
        eval_items, tokenizer, source_max_len=src_len, target_max_len=0,
        predict_with_generate=True)
    ids, mask = batch_data["input_ids"], batch_data["attention_mask"]
    gc = GenerationConfig(
        max_new_tokens=min(args.max_new_tokens, 16 if args.smoke else 10**9),
        num_beams=args.num_beams, do_sample=args.do_sample,
        temperature=args.temperature if args.temperature is not None else 1.0,
        top_p=args.top_p if args.top_p is not None else 1.0,
        top_k=args.top_k if args.top_k is not None else 0,
        repetition_penalty=args.repetition_penalty,
        no_repeat_ngram_size=args.no_repeat_ngram_size,
        eos_token_id=tokenizer.eos_token_id,
        pad_token_id=tokenizer.pad_token_id)
    bs, n = args.batch_size, len(ids)
    rows = []
    for s in range(0, n, bs):
        b_ids, b_mask = ids[s:s + bs], mask[s:s + bs]
        if len(b_ids) < bs:  # static shapes: pad the tail batch
            reps = bs - len(b_ids)
            b_ids = np.concatenate([b_ids, np.repeat(b_ids[-1:], reps, 0)])
            b_mask = np.concatenate([b_mask, np.repeat(b_mask[-1:], reps, 0)])
        out = np.asarray(generate(model, b_ids, b_mask, gc))
        for j in range(min(bs, n - s)):
            toks = [t for t in out[j] if t != tokenizer.pad_token_id]
            new = [t for t in out[j, ids.shape[1]:]
                   if t != tokenizer.pad_token_id]
            row = dict(eval_items[s + j])
            row["prediction_with_input"] = tokenizer.decode(toks).strip()
            row["prediction"] = tokenizer.decode(new).strip()
            rows.append(row)
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "predictions.jsonl")
    with open(path, "w") as f:
        for row in rows:
            f.write(json.dumps(row) + "\n")
    print(f"[alpaca] wrote {len(rows)} predictions to {path}")
    return {"predict_samples": len(rows)}


def main():
    args, overrides = parse_args()
    import numpy as np
    from sparse_matrix_fine_tuning_tpu.data.mmlu import load_mmlu_items, mmlu_accuracy
    from sparse_matrix_fine_tuning_tpu.data.alpaca import (
        collate_causal_lm, format_items, train_eval_split)
    from sparse_matrix_fine_tuning_tpu.data.reasoning import load_data_items
    from sparse_matrix_fine_tuning_tpu.data.tokenizer import SimpleTokenizer, get_tokenizer
    from sparse_matrix_fine_tuning_tpu.training import Trainer, TrainingArgs
    from sparse_matrix_fine_tuning_tpu.training.hpo import (
        choice, hyperparameter_search, loguniform)
    from sparse_matrix_fine_tuning_tpu.utils.config import (
        load_best_hp, load_json, override_config, save_best_hp)

    peft_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "task_configs", "llama", "peft_config.json")
    peft_config = load_json(peft_path)
    extra = override_config([peft_config, args], overrides)
    if extra:
        print(f"[alpaca] unmatched overrides: {extra}")

    out_dir = os.path.join(args.output_dir, args.dataset)
    tokenizer = SimpleTokenizer(vocab_size=SMOKE_VOCAB) if args.smoke \
        else get_tokenizer(args.model, vocab_size=32000)

    all_items = load_data_items(
        "alpaca", args.dataset if args.dataset != "alpaca" else "alpaca_data_cleaned",
        args.data_dir, split="train", max_n_example=args.max_n_train_example,
        seed=args.seed, smoke=args.smoke)
    # per-dataset raw-row normalisation (reference format_dataset); smoke
    # items are already alpaca-shaped
    if not args.smoke:
        all_items = format_items(all_items, args.dataset_format, args.dataset)
    if args.do_eval or args.do_predict:
        # reference builds the eval split when either flag is set and
        # predicts on it (qlora.py:658-664)
        train_items, eval_items = train_eval_split(
            all_items, args.eval_dataset_size, seed=args.seed)
    else:
        train_items, eval_items = all_items, None
    src_len, tgt_len = ((128, 64) if args.smoke
                        else (args.source_max_len, args.target_max_len))
    collate = lambda items: collate_causal_lm(
        items, tokenizer, source_max_len=src_len, target_max_len=tgt_len,
        train_on_source=args.train_on_source)
    if args.pack:
        from sparse_matrix_fine_tuning_tpu.data.alpaca import pack_causal_lm
        train_data, eff = pack_causal_lm(
            train_items, tokenizer,
            max_len=args.pack_max_len or (src_len + tgt_len),
            source_max_len=src_len, target_max_len=tgt_len,
            train_on_source=args.train_on_source)
        print(f"[alpaca] packed {len(train_items)} examples into "
              f"{len(train_data['input_ids'])} rows "
              f"({eff:.0%} token efficiency)")
    else:
        train_data = collate(train_items)
    eval_data = collate(eval_items) if (eval_items and args.do_eval) else None

    mmlu_eval = mmlu_dev = None
    if args.do_mmlu_eval:
        mmlu_eval = load_mmlu_items(args.data_dir, args.mmlu_split,
                                    smoke=args.smoke, seed=args.seed)
        if args.max_mmlu_samples:
            mmlu_eval = mmlu_eval[:args.max_mmlu_samples]
        mmlu_dev = load_mmlu_items(args.data_dir, "dev", smoke=args.smoke,
                                   seed=args.seed + 1, smoke_n=8)
    if eval_items and args.max_eval_samples:
        eval_items = eval_items[:args.max_eval_samples]
        if eval_data is not None:
            eval_data = {k: v[:args.max_eval_samples]
                         for k, v in eval_data.items()}

    def lm_loss(model, batch, train):
        if hasattr(model, "training_loss"):
            # fused forward+CE; chunked (never materialises full logits)
            # when --loss_chunk > 0
            return model.training_loss(
                batch["input_ids"], batch["labels"],
                attention_mask=batch["attention_mask"],
                segment_ids=batch.get("segment_ids"),
                weights=batch.get("_valid"))
        logits = model(batch["input_ids"], attention_mask=batch["attention_mask"],
                       segment_ids=batch.get("segment_ids"))
        return model.loss(logits, batch["labels"], weights=batch.get("_valid"))

    def mmlu_metrics(model, _data):
        if mmlu_eval is None:
            return {}
        return mmlu_accuracy(model, tokenizer, mmlu_eval, mmlu_dev,
                             k_shot=args.mmlu_kshot if not args.smoke else 1,
                             max_length=256 if args.smoke else 2048)

    def make_trainer(hp=None, epochs=None, logger=None):
        pc = dict(peft_config)
        ta = TrainingArgs(
            output_dir=out_dir, learning_rate=args.lr,
            num_train_epochs=epochs if epochs is not None else args.epochs,
            max_steps=args.max_steps,
            per_device_train_batch_size=args.batch_size,
            gradient_accumulation_steps=args.gradient_accumulation_steps,
            lr_scheduler_type=args.lr_scheduler_type, optim=args.optim,
            warmup_ratio=args.warmup_ratio, weight_decay=args.weight_decay,
            max_grad_norm=args.max_grad_norm, save_steps=args.save_steps,
            save_total_limit=args.save_total_limit,
            logging_steps=args.logging_steps, log_param_steps=0, seed=args.seed,
            group_by_length=args.group_by_length,
            metric_for_best_model="mmlu_eval_accuracy", greater_is_better=True)
        if hp:
            override_config([ta, pc], hp)
        model = build_model(args, pc)
        return Trainer(model, ta, train_data=train_data, eval_data=eval_data,
                       loss_fn=lm_loss, compute_metrics=mmlu_metrics,
                       logger=logger)

    def ensure_mmlu(metrics, model):
        """--do_eval=False skips the loss-eval loop (no eval_data), but an
        explicitly requested MMLU eval must still run -- in trials (the HPO
        target metric) AND the final run (reference runs the MMLU callback
        independently of do_eval, qlora_monarch.py:671-715)."""
        if mmlu_eval is not None and not any("mmlu" in k for k in metrics):
            metrics = dict(metrics)
            metrics.update({f"eval_{k}": v
                            for k, v in mmlu_metrics(model, None).items()})
        return metrics

    if args.do_tune:
        space = {"learning_rate": loguniform(5e-5, 1e-3),
                 "blk_r": choice([4, 8, 16])}

        def run_trial(hp, epochs, trial_id):
            # per-trial dir: parallel trials must not share checkpoints;
            # resume=True extends survivors across rung budgets
            hp = dict(hp, output_dir=os.path.join(out_dir, f"trial_{trial_id}"))
            t = make_trainer(hp, epochs)
            return ensure_mmlu(t.train(resume=True), t.model)

        import jax

        result = hyperparameter_search(
            run_trial, space, n_trials=args.n_trials, parallel_trials=args.parallel_trials,
            devices=jax.devices() if args.parallel_trials > 1 else None,
            target_metric="eval_mmlu_eval_accuracy", mode="max",
            max_epochs=float(args.epochs))
        save_best_hp(result["best_hyperparams"], out_dir)
        hp = result["best_hyperparams"]
        print(json.dumps({"best_hyperparams": hp,
                          "best_metric": result["best_metric"]}))
    else:
        hp = load_best_hp(out_dir)

    from sparse_matrix_fine_tuning_tpu.utils.logging import (
        RunLogger, get_run_group, watch_layers)
    os.makedirs(out_dir, exist_ok=True)
    logger = RunLogger(out_dir, group=get_run_group(task_name=args.dataset,
                                                    do_tune=args.do_tune),
                       name=f"{args.dataset}_final",
                       config={"dataset": args.dataset, "bits": args.bits,
                               "hp": hp or {}})
    trainer = make_trainer(hp, logger=logger)
    watch_layers(trainer.model, logger)
    if args.profile:
        import jax
        jax.profiler.start_trace(os.path.join(out_dir, "profile"))
    metrics = trainer.train(resume=args.resume)
    if args.profile:
        import jax
        jax.profiler.stop_trace()
    metrics = ensure_mmlu(metrics, trainer.model)
    if args.do_predict:
        metrics.update(predict_generations(
            trainer.model, tokenizer, eval_items, args, out_dir,
            src_len=src_len, collate_causal_lm=collate_causal_lm))
    logger.log({"step": trainer.step, **metrics})
    watch_layers(trainer.model, logger)
    logger.finish()
    print(json.dumps(metrics))
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "eval_results.json"), "w") as f:
        json.dump(metrics, f, indent=1)
    return metrics


if __name__ == "__main__":
    main()
