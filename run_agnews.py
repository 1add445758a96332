"""AG News classification: full fine-tune vs LoRA vs Monarch comparison.

TPU-native equivalent of the reference's standalone AG News scripts
(reference agnews_train_scripts/{finetune,lora,monarch}_roberta.py +
agnews_utils.py): RoBERTa-base on 4-way news classification, comparing
parameter budgets across adaptation methods.

  python run_agnews.py --method monarch|lora|full [--smoke=True]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

SMOKE_VOCAB = 1024


def parse_args():
    p = argparse.ArgumentParser(description="AG News (TPU-native)")
    p.add_argument("--method", default="monarch", choices=["monarch", "lora", "full"])
    p.add_argument("--model", default="roberta-base")
    p.add_argument("--smoke", default=False, type=eval)
    p.add_argument("-e", "--epochs", default=2.0, type=float)
    p.add_argument("-lr", "--lr", default=1e-4, type=float)
    p.add_argument("-batch_size", "--batch_size", default=32, type=int)
    p.add_argument("--max_seq_length", default=128, type=int)
    p.add_argument("--output_dir", default="results/agnews")
    p.add_argument("--logging_steps", default=50, type=int)
    p.add_argument("--platform", default=None)
    args, unknown = p.parse_known_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    return args, unknown


def load_agnews(tokenizer, max_seq_length, smoke=False, smoke_n=256):
    """4-class news topic data; synthetic fallback with topic marker words
    (reference agnews_utils.py:15-40 prep_data)."""
    if not smoke:
        try:
            import datasets as hfds
            raw = hfds.load_dataset("ag_news")
            out = {}
            for split in ("train", "test"):
                ids, mask = tokenizer.encode_batch(raw[split]["text"],
                                                   max_length=max_seq_length)
                out[split] = {"input_ids": ids, "attention_mask": mask,
                              "labels": np.asarray(raw[split]["label"], np.int32)}
            return out
        except Exception as e:
            print(f"[agnews] synthetic fallback ({type(e).__name__})")
    topics = ["world politics nations", "sports game team", "business market stock",
              "science tech computer"]
    rng = np.random.default_rng(0)
    out = {}
    for split, n in (("train", smoke_n), ("test", max(smoke_n // 4, 32))):
        texts, labels = [], []
        for i in range(n):
            y = int(rng.integers(0, 4))
            filler = " ".join(str(x) for x in rng.integers(0, 50, 5))
            texts.append(topics[y] + " " + filler)
            labels.append(y)
        ids, mask = tokenizer.encode_batch(texts, max_length=max_seq_length)
        out[split] = {"input_ids": ids, "attention_mask": mask,
                      "labels": np.asarray(labels, np.int32)}
    return out


def main():
    args, overrides = parse_args()
    from flax import nnx
    from sparse_matrix_fine_tuning_tpu.data.tokenizer import SimpleTokenizer, get_tokenizer
    from sparse_matrix_fine_tuning_tpu.models import (
        RobertaConfig, RobertaForSequenceClassification)
    from sparse_matrix_fine_tuning_tpu.peft import init_lora, init_monarch, param_stats
    from sparse_matrix_fine_tuning_tpu.training import Trainer, TrainingArgs
    from sparse_matrix_fine_tuning_tpu.utils.metrics import accuracy

    tokenizer = SimpleTokenizer(vocab_size=SMOKE_VOCAB) if args.smoke \
        else get_tokenizer(args.model)
    data = load_agnews(tokenizer, args.max_seq_length, smoke=args.smoke)

    if args.smoke:
        cfg = RobertaConfig.tiny(num_labels=4, vocab_size=SMOKE_VOCAB)
        model = RobertaForSequenceClassification(cfg, rngs=nnx.Rngs(0))
    elif os.path.isdir(args.model):
        from sparse_matrix_fine_tuning_tpu.models.hf_convert import from_pretrained_roberta
        model = from_pretrained_roberta(args.model, num_labels=4)
    else:
        cfg = RobertaConfig.base(num_labels=4)
        model = RobertaForSequenceClassification(cfg, rngs=nnx.Rngs(0))

    extra_paths = ("classifier",)
    if args.method == "monarch":
        init_monarch(model, {"monarch": True, "nblocks": 4, "blk_r": 4,
                             "adapter": True,
                             "target_modules": ["query", "value", "key"]},
                     rngs=nnx.Rngs(1))
    elif args.method == "lora":
        init_lora(model, {"target_modules": ["query", "value"], "r": 8},
                  rngs=nnx.Rngs(1))
    else:  # full fine-tune: everything trainable
        extra_paths = ("__all__",)
    total, trainable = param_stats(model, extra_paths=extra_paths)

    def compute_metrics(model, data):
        from sparse_matrix_fine_tuning_tpu.evaluation import predict_classes
        preds = predict_classes(model, data)
        return {"accuracy": accuracy(preds, data["labels"])}

    ta = TrainingArgs(
        output_dir=os.path.join(args.output_dir, args.method),
        learning_rate=args.lr, num_train_epochs=args.epochs,
        per_device_train_batch_size=args.batch_size,
        logging_steps=args.logging_steps, log_param_steps=0,
        lr_scheduler_type="cosine",
        # news headlines vary widely in length: trim batches to bucketed
        # maxima (TPU-native group_by_length, docs/BENCHMARKS.md)
        group_by_length=True, length_bucket=32)
    from sparse_matrix_fine_tuning_tpu.utils.logging import (
        RunLogger, get_run_group, watch_layers)
    logger = RunLogger(ta.output_dir, group=get_run_group(task_name="agnews"),
                       name=f"agnews_{args.method}",
                       config={"method": args.method})
    trainer = Trainer(model, ta, train_data=data["train"], eval_data=data["test"],
                      compute_metrics=compute_metrics,
                      extra_trainable_paths=extra_paths, logger=logger)
    if args.method != "full":
        watch_layers(trainer.model, logger)
    metrics = trainer.train()
    logger.log({"step": trainer.step, **metrics})
    logger.finish()
    result = {"method": args.method, "trainable_params": int(trainable),
              "total_params": int(total), **metrics}
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
