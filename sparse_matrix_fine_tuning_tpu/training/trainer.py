"""jit/pjit training loop -- the TPU-native replacement for HF Trainer.

Built on NNX transforms: one ``nnx.jit`` step takes (model, optimizer,
batch); gradients are taken ONLY w.r.t. the trainable filter
(``nnx.DiffState``) so the frozen base never gets a gradient buffer -- the
TPU-native equivalent of requires_grad=False (reference
train_utils.py:499-505).  RNG streams (adapter dropout) advance natively
through the nnx transforms.

Capabilities mirrored from the reference harness layer:
  * 3-group AdamW (optim.py), warmup + cosine/linear schedules
  * gradient accumulation (optax.MultiSteps)
  * periodic eval with a pluggable metric fn, best-checkpoint tracking
    (HF ``load_best_model_at_end`` -- task_configs/monarch_roberta_glue/cola.json:20-23)
  * trainable-params-only checkpoints (reference train_utils.py:297-307)
  * periodic ``param_stats`` sanity prints (train_utils.py:286-295)
  * optional ("dp","fsdp","tp") mesh: frozen base FSDP-sharded (plus
    Megatron col/row tensor-parallel over "tp" when sized > 1), adapters +
    optimizer state replicated, batches data-parallel.
"""

from __future__ import annotations

import dataclasses
import json
import os
import math
import time
from typing import Callable, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from sparse_matrix_fine_tuning_tpu.parallel.sharding import batch_sharding, shard_state
from sparse_matrix_fine_tuning_tpu.peft.surgery import (
    DEFAULT_TRAINABLE_PATHS,
    param_stats,
    trainable_filter,
)
from sparse_matrix_fine_tuning_tpu.training import checkpoint as ckpt_lib
from sparse_matrix_fine_tuning_tpu.training.optim import build_optimizer


@dataclasses.dataclass
class TrainingArgs:
    output_dir: str = "results/run"
    learning_rate: float = 5e-5
    num_train_epochs: float = 3.0
    max_steps: int = -1
    # Single-host: the per-STEP micro-batch size over all local devices
    # (HF meaning at device_count=1; with a mesh the batch axis is sharded
    # over dp/fsdp).  Multihost (jax.process_count() > 1): the PER-PROCESS
    # rows this host feeds -- the global micro-batch is
    # per_device_train_batch_size * process_count (parallel/multihost.py
    # contract); single-host configs port unchanged per host, not per pod.
    per_device_train_batch_size: int = 16
    per_device_eval_batch_size: int = 32
    gradient_accumulation_steps: int = 1
    weight_decay: float = 0.0
    warmup_ratio: float = 0.06
    lr_scheduler_type: str = "linear"
    max_grad_norm: float = 1.0
    seed: int = 42
    logging_steps: int = 50
    eval_steps: int = 0            # 0 = eval at epoch end only
    save_steps: int = 0            # 0 = save at end only
    save_total_limit: int = 1
    load_best_model_at_end: bool = False
    metric_for_best_model: str = "loss"
    greater_is_better: Optional[bool] = None
    # 3-group optimizer extras (reference train_utils.py:309-356)
    large_lr: bool = False
    new_lr: float = 5e-3
    use_scaler: bool = False
    # "adamw" | "adamw8bit" (int8 moments, embeddings kept fp32 --
    # reference bitsandbytes Adam8bit + GlobalOptimManager override)
    optim: str = "adamw"
    log_param_steps: int = 900
    bf16: bool = False
    # merge-during-training (kernels/merged.py): "auto" enables it on every
    # eligible MonarchLinear (costs one dense-sized cache pair per layer --
    # pass "off" for memory-tight single-chip 7B runs)
    merged_training: str = "auto"
    # static/mutable state split: the frozen base (and quant scales) enter
    # the jitted step as INPUT-ONLY args and are never returned, so the
    # step's outputs are just loss + adapters + optimizer state + RNG
    # counts (~MBs, not GBs).  On runtimes that honour buffer donation this
    # is free; on ones that don't (this sandbox's tunnel) it removes the
    # 2x-params round-trip that made single-chip 7B OOM (int4 7B plan:
    # 10.02 GB -> 5.85 GB measured)
    state_split: bool = True
    # TPU-native group_by_length (reference qlora_monarch.py:537-544 uses
    # HF's LengthGroupedSampler): sort rows by true length within shuffled
    # megabatches, then TRIM each batch's time axis to its bucketed max --
    # a handful of static shapes (each compiled once) instead of every
    # batch padding to the global max
    group_by_length: bool = False
    length_bucket: int = 64
    # Megatron-style sequence parallelism (parallel/annotate.py): shard the
    # residual-stream/norm activations over the tp mesh axis along seq.
    # "auto" = on whenever the mesh has tp > 1; "on" / "off" force it.
    sequence_parallel: str = "auto"


class Trainer:
    """Minimal-but-complete PEFT trainer.

    Args:
      model: NNX model (already adapter-surgeried).
      args: TrainingArgs.
      train_data / eval_data: dict[str, np.ndarray] with equal leading dim.
      loss_fn: (model, batch, train: bool) -> scalar loss.  Default expects
        model(input_ids, attention_mask) + model.loss(logits, labels).
      compute_metrics: (model, eval_data) -> dict, optional; the default
        eval reports loss only.
      mesh: optional jax Mesh for sharded training.
    """

    def __init__(self, model: nnx.Module, args: TrainingArgs,
                 train_data: Optional[dict] = None,
                 eval_data: Optional[dict] = None,
                 loss_fn: Optional[Callable] = None,
                 compute_metrics: Optional[Callable] = None,
                 mesh=None,
                 logger=None,
                 extra_trainable_paths: Iterable[str] = DEFAULT_TRAINABLE_PATHS):
        self.model = model
        self.args = args
        self.train_data = train_data
        self.eval_data = eval_data
        self.loss_fn = loss_fn or self._default_loss
        self.compute_metrics = compute_metrics
        self.mesh = mesh
        self.logger = logger
        self.extra_paths = tuple(extra_trainable_paths)
        self.filt = trainable_filter(self.extra_paths)
        self.step = 0
        self.log_history: list[dict] = []
        self.best_metric = None
        self.best_ckpt = None
        self._build()

    # ------------------------------------------------------------------
    @staticmethod
    def _default_loss(model, batch, train: bool):
        kwargs = {}
        if "attention_mask" in batch:
            kwargs["attention_mask"] = batch["attention_mask"]
        lkw = {"weights": batch["_valid"]} if "_valid" in batch else {}
        if hasattr(model, "training_loss"):
            # causal-LM fused forward+CE (chunked when config.loss_chunk>0,
            # ops/losses.py: full logits never materialised)
            return model.training_loss(batch["input_ids"], batch["labels"],
                                       **kwargs, **lkw)
        logits = model(batch["input_ids"], **kwargs)
        return model.loss(logits, batch["labels"], **lkw)

    def _n_examples(self, data):
        return len(next(iter(data.values())))

    def num_training_steps(self) -> int:
        if self.args.max_steps > 0:
            return self.args.max_steps
        n = self._n_examples(self.train_data)
        per_step = self.args.per_device_train_batch_size
        steps_per_epoch = math.ceil(n / per_step / max(self.args.gradient_accumulation_steps, 1))
        return int(math.ceil(steps_per_epoch * self.args.num_train_epochs))

    @property
    def trainable(self):
        return nnx.state(self.model, self.filt)

    # ------------------------------------------------------------------
    def _build(self):
        a = self.args
        # merge-during-training: collapse frozen dense + adapter into one
        # matmul operand, refreshed once per optimizer step (kernels/merged.py).
        # "auto" requires gradient accumulation: the per-step merge rebuild
        # amortizes over the micro-batches; at ga=1 it can cost more than the
        # adapter work it removes ("on" forces it regardless).
        self._n_merged = 0
        ga = max(a.gradient_accumulation_steps, 1)
        if a.merged_training == "on":
            from sparse_matrix_fine_tuning_tpu.peft.surgery import (
                enable_merged_training)
            self._n_merged = enable_merged_training(self.model)
        elif a.merged_training == "auto" and ga >= 2:
            # measured crossover: the rebuild amortizes for >= 4096-dim
            # projections (the 7B shapes); smaller layers stay unmerged
            from sparse_matrix_fine_tuning_tpu.peft.surgery import (
                enable_merged_training)
            self._n_merged = enable_merged_training(self.model, min_dim=4096)
        if self._n_merged:
            # resolve the per-runtime dw-kernel choice NOW so the one-time
            # probe (if any) runs in setup, not inside the first train-step
            # trace (kernels/runtime_gate.py)
            from sparse_matrix_fine_tuning_tpu.kernels.runtime_gate import (
                use_fused_dw)
            use_fused_dw()

        total = self.num_training_steps() if self.train_data is not None else 1
        G = max(a.gradient_accumulation_steps, 1)
        # gradient accumulation runs INSIDE the jitted step (lax.scan over
        # micro-batches): one dispatch per optimizer step, and the merged
        # operands hoist out of the scan -- so no optax.MultiSteps here
        self.tx = build_optimizer(
            self.trainable,
            learning_rate=a.learning_rate,
            total_steps=total,
            warmup_ratio=a.warmup_ratio,
            lr_scheduler_type=a.lr_scheduler_type,
            weight_decay=a.weight_decay,
            large_lr=a.large_lr,
            new_lr=a.new_lr,
            use_scaler=a.use_scaler,
            max_grad_norm=a.max_grad_norm,
            gradient_accumulation_steps=1,
            optim=a.optim,
        )
        self.optimizer = nnx.Optimizer(self.model, self.tx, wrt=self.filt)

        if self.mesh is not None:
            from sparse_matrix_fine_tuning_tpu.layers.monarch_linear import MergedCache
            # frozen base (and merged caches) FSDP-sharded; adapters +
            # optimizer state replicated
            frozen_params = nnx.All(nnx.Param, nnx.Not(self.filt))
            nnx.update(self.model,
                       shard_state(nnx.state(self.model, frozen_params), self.mesh))
            nnx.update(self.model,
                       shard_state(nnx.state(self.model, nnx.OfType(MergedCache)),
                                   self.mesh))
            nnx.update(self.model,
                       shard_state(self.trainable, self.mesh, replicate=True))
            nnx.update(self.optimizer,
                       shard_state(nnx.state(self.optimizer), self.mesh, replicate=True))

        filt, loss_fn = self.filt, self.loss_fn
        n_merged = self._n_merged

        def refresh(model):
            if n_merged:
                from sparse_matrix_fine_tuning_tpu.peft.surgery import refresh_merged
                refresh_merged(model)

        def inner(m, b):
            return loss_fn(m, b, True)

        def train_step_raw(model, optimizer, batch):
            refresh(model)
            loss, grads = nnx.value_and_grad(
                inner, argnums=nnx.DiffState(0, filt))(model, batch)
            optimizer.update(model, grads)
            return loss

        def train_step_accum_raw(model, optimizer, batch):
            # batch leaves: (G, micro_bs, ...); scan accumulates grads so the
            # merged operands (and any other step-invariant work) hoist out
            refresh(model)
            zero = jax.tree.map(lambda v: jnp.zeros(v.shape, jnp.float32),
                                nnx.state(model, filt))

            @nnx.scan(in_axes=(nnx.Carry, 0), out_axes=nnx.Carry)
            def micro(carry, mb):
                model, gacc, lacc = carry
                loss, grads = nnx.value_and_grad(
                    inner, argnums=nnx.DiffState(0, filt))(model, mb)
                gacc = jax.tree.map(lambda acm, g: acm + g.astype(acm.dtype),
                                    gacc, grads)
                return (model, gacc, lacc + loss)

            model, gacc, lacc = micro((model, zero, jnp.float32(0)), batch)
            grads = jax.tree.map(lambda g: g / G, gacc)
            optimizer.update(model, grads)
            return lacc / G

        # donate model+optimizer state: without this the step holds input
        # AND output copies of every parameter (fatal at 7B scale)
        train_step = nnx.jit(donate_argnums=(0, 1))(train_step_raw)
        train_step_accum = nnx.jit(donate_argnums=(0, 1))(train_step_accum_raw)

        @nnx.jit
        def eval_step(model, batch):
            return loss_fn(model, batch, False)

        if a.state_split:
            # frozen base + quant scales as input-only jit args (see
            # TrainingArgs.state_split).  The wrappers keep the
            # (model, optimizer, batch) signature: split before, update
            # after, so self.model stays the source of truth.
            from functools import partial

            from sparse_matrix_fine_tuning_tpu.layers.monarch_linear import (
                MergedCache)
            from sparse_matrix_fine_tuning_tpu.quant import QuantScales
            # MergedCache is static too: refresh() overwrites it at the top
            # of every step, so its input value is dead and returning it
            # would put dense-sized buffers back into the step outputs
            static_f = nnx.Any(nnx.All(nnx.Param, nnx.Not(filt)),
                               nnx.OfType(QuantScales),
                               nnx.OfType(MergedCache))
            self._static_filter = static_f

            def make_split(body):
                # graphdef is a STATIC jit arg taken fresh at every call:
                # train()/eval() mode flips (dropout determinism) live in
                # the graphdef, so baking a build-time graphdef in would
                # silently pin the step to the build-time mode
                @partial(jax.jit, static_argnums=(0,), donate_argnums=(2,))
                def split_jit(graphdef, static, rest, batch):
                    model, optimizer = nnx.merge(graphdef, static, rest)
                    loss = body(model, optimizer, batch)
                    _, _, new_rest = nnx.split((model, optimizer),
                                               static_f, ...)
                    return loss, new_rest

                def wrapper(model, optimizer, batch):
                    graphdef, static, rest = nnx.split((model, optimizer),
                                                       static_f, ...)
                    loss, new_rest = split_jit(graphdef, static, rest, batch)
                    nnx.update((model, optimizer), new_rest)
                    return loss
                return wrapper

            train_step = make_split(train_step_raw)
            train_step_accum = make_split(train_step_accum_raw)

        tp_size = self.mesh.shape.get("tp", 1) if self.mesh is not None else 1
        sp_on = a.sequence_parallel == "on" or (
            a.sequence_parallel == "auto" and tp_size > 1)
        if sp_on and self.mesh is not None:
            # scoped per call so the jit TRACES (which bake the constraints)
            # see this trainer's mesh, and trainers without one are untouched
            from sparse_matrix_fine_tuning_tpu.parallel.annotate import (
                activation_mesh)

            def with_sp(fn, mesh=self.mesh):
                def wrapped(*args, **kw):
                    with activation_mesh(mesh):
                        return fn(*args, **kw)
                return wrapped

            train_step = with_sp(train_step)
            train_step_accum = with_sp(train_step_accum)
            eval_step = with_sp(eval_step)

        self._train_step = train_step
        self._train_step_accum = train_step_accum
        self._eval_step = eval_step

    # ------------------------------------------------------------------
    # keys carrying a (batch, time, ...) axis that group_by_length may trim;
    # intervention_locations hold token POSITIONS (sink-relative, within the
    # unpadded length for right-padded training rows) so trimming the pad
    # tail never invalidates them -- but their axis 1 is not time, skip them
    _TIME_KEYS = ("input_ids", "attention_mask", "labels", "token_type_ids",
                  "position_ids", "segment_ids")

    def _length_grouped_order(self, data, idx, macro):
        """HF LengthGroupedSampler semantics (reference qlora group_by_length):
        chunk the shuffled order into megabatches and sort each by true
        length descending, so co-batched rows have similar lengths."""
        lengths = np.asarray(data["attention_mask"]).sum(axis=1)
        mega = macro * 8
        out = []
        for s in range(0, len(idx), mega):
            chunk = idx[s:s + mega]
            out.append(chunk[np.argsort(-lengths[chunk], kind="stable")])
        return np.concatenate(out) if out else idx

    def _trim_batch(self, batch):
        """Trim the time axis to the batch's bucketed max length.  Buckets
        are multiples of ``length_bucket`` so only a few shapes compile.

        Multihost: each process holds a DIFFERENT slice of the global
        batch, so the trim length is the cross-host max of the bucketed
        local maxes -- trimming to the local max would hand
        ``make_array_from_process_local_data`` different global shapes on
        different hosts and hang the collectives."""
        if "attention_mask" not in batch:
            return batch
        T = batch["attention_mask"].shape[-1]
        maxlen = int(batch["attention_mask"].sum(axis=1).max())
        q = max(self.args.length_bucket, 1)
        maxlen = min(-(-maxlen // q) * q, T)
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils
            maxlen = int(np.max(multihost_utils.process_allgather(
                np.int32(maxlen))))
        if maxlen >= T:
            return batch
        return {k: (v[:, :maxlen] if k in self._TIME_KEYS
                    and v.ndim >= 2 and v.shape[1] == T else v)
                for k, v in batch.items()}

    def steps_per_epoch(self) -> int:
        n = self._n_examples(self.train_data)
        per_step = self.args.per_device_train_batch_size
        return math.ceil(n / per_step / max(self.args.gradient_accumulation_steps, 1))

    def _batches(self, data, batch_size, shuffle=True, seed=0, accum=1,
                 skip=0):
        """Yield (batch, n_valid).  accum>1 yields macro batches with leaves
        reshaped to (accum, batch_size, ...) for the in-jit scan.

        ``skip``: fast-forward past the first ``skip`` batches WITHOUT
        materialising them (mid-epoch resume, reference behavior = HF
        Trainer's skipped-batch dataloader replay): the shuffled order is a
        pure function of ``seed``, so a resumed run sees the identical
        remaining batch sequence an uninterrupted run would."""
        n = self._n_examples(data)
        idx = np.arange(n)
        if shuffle:
            np.random.default_rng(seed).shuffle(idx)
        macro = batch_size * max(accum, 1)
        group = (self.args.group_by_length and shuffle
                 and "attention_mask" in data)
        if group:
            idx = self._length_grouped_order(data, idx, macro)
        for start in range(skip * macro, n, macro):
            sel = idx[start:start + macro]
            batch = {k: v[sel] for k, v in data.items()}
            if group:
                batch = self._trim_batch(batch)
            if len(sel) < macro:
                # pad ragged tail for static shapes (single compilation)
                pad = macro - len(sel)
                batch = {k: np.concatenate([v, np.repeat(v[-1:], pad, 0)])
                         for k, v in batch.items()}
                batch["_valid"] = np.concatenate(
                    [np.ones(len(sel), np.int32), np.zeros(pad, np.int32)])
            if accum > 1:
                batch = {k: v.reshape(accum, batch_size, *v.shape[1:])
                         for k, v in batch.items()}
            if self.mesh is not None:
                if jax.process_count() > 1:
                    # multihost: this process's rows are its slice of the
                    # global batch (data pre-sharded per process, batch
                    # size = per-process rows -- parallel/multihost.py)
                    from sparse_matrix_fine_tuning_tpu.parallel.multihost import (
                        global_batch)
                    batch = global_batch(batch, self.mesh, macro=accum > 1)
                else:
                    sh = batch_sharding(self.mesh, macro=accum > 1)
                    batch = {k: jax.device_put(jnp.asarray(v), sh)
                             for k, v in batch.items()}
            else:
                batch = {k: jnp.asarray(v) for k, v in batch.items()}
            yield batch, len(sel)

    # ------------------------------------------------------------------
    def train(self, resume: bool = False):
        a = self.args
        if resume:
            self._maybe_resume()
        total_steps = self.num_training_steps()
        bs = a.per_device_train_batch_size
        # HF semantics: max_steps > 0 OVERRIDES num_train_epochs -- the run
        # cycles epochs until max_steps, not until the epoch budget (the LR
        # schedule is built for total_steps, so stopping at the epoch bound
        # would quietly under-train with the LR mid-schedule)
        if a.max_steps > 0:
            epochs = int(math.ceil(total_steps / max(self.steps_per_epoch(), 1)))
        else:
            epochs = int(math.ceil(a.num_train_epochs))
        G = max(a.gradient_accumulation_steps, 1)
        step_fn = self._train_step_accum if G > 1 else self._train_step
        t0 = time.time()
        running = []
        # throughput window for periodic logs (first window includes the
        # step compile, so its tokens_per_s reads low -- by design)
        self._tokens_window, self._tokens_t0 = 0, t0
        done = False
        self.model.train()
        # mid-epoch resume fidelity: self.step (restored from the checkpoint)
        # determines the epoch and in-epoch batch cursor; the first resumed
        # epoch fast-forwards the deterministic (seed + epoch)-shuffled
        # stream so the batch sequence matches an uninterrupted run
        spe = max(self.steps_per_epoch(), 1)
        start_epoch = min(self.step // spe, max(epochs - 1, 0))
        skip = self.step - start_epoch * spe
        for epoch in range(start_epoch, epochs):
            if done:
                break
            for batch, _ in self._batches(self.train_data, bs, shuffle=True,
                                          seed=a.seed + epoch, accum=G,
                                          skip=skip if epoch == start_epoch else 0):
                loss = step_fn(self.model, self.optimizer, batch)
                if a.logging_steps:  # else the list would grow unbounded
                    running.append(loss)
                    # static shapes: (G, bs, T) or (bs, T) -- no device sync
                    self._tokens_window += int(
                        math.prod(batch["input_ids"].shape))
                self.step += 1
                if a.logging_steps and self.step % a.logging_steps == 0:
                    mean_loss = float(jnp.mean(jnp.stack(running)))
                    running = []
                    now = time.time()
                    tps = self._tokens_window / max(now - self._tokens_t0, 1e-9)
                    self._tokens_window, self._tokens_t0 = 0, now
                    rec = {"step": self.step, "loss": round(mean_loss, 5),
                           "tokens_per_s": round(tps),
                           "elapsed_s": round(now - t0, 1)}
                    self.log_history.append(rec)
                    print(json.dumps(rec))
                    if self.logger is not None:
                        self.logger.log(rec)
                if a.log_param_steps and self.step % a.log_param_steps == 0:
                    param_stats(self.model, extra_paths=self.extra_paths)
                    if self.logger is not None:
                        from sparse_matrix_fine_tuning_tpu.utils.logging import watch_layers
                        watch_layers(self.model, self.logger)
                if a.eval_steps and self.step % a.eval_steps == 0 and self.eval_data is not None:
                    self._do_eval()
                    self.model.train()
                if a.save_steps and self.step % a.save_steps == 0:
                    self.save_checkpoint()
                if self.step >= total_steps:
                    done = True
                    break
            if not a.eval_steps and self.eval_data is not None and not done:
                self._do_eval()
                self.model.train()
        self.model.eval()
        if self._n_merged:
            # sync caches with the final optimizer update so downstream
            # users (generation evals) see fresh merged weights
            from sparse_matrix_fine_tuning_tpu.peft.surgery import refresh_merged
            refresh_merged(self.model)
        metrics = {}
        if self.eval_data is not None:
            metrics = self._do_eval()
        self.save_checkpoint(final=True)
        if a.load_best_model_at_end and self.best_ckpt is not None:
            self.load_checkpoint(self.best_ckpt)
        return metrics

    # ------------------------------------------------------------------
    def evaluate(self, eval_data: Optional[dict] = None) -> dict:
        data = eval_data if eval_data is not None else self.eval_data
        a = self.args
        if self._n_merged:
            # caches are refreshed at the TOP of each train step, so they
            # trail the last optimizer update by one -- refresh before eval
            from sparse_matrix_fine_tuning_tpu.peft.surgery import refresh_merged
            refresh_merged(self.model)
        self.model.eval()
        losses, counts = [], []
        for batch, n_valid in self._batches(data, a.per_device_eval_batch_size,
                                            shuffle=False):
            losses.append(float(self._eval_step(self.model, batch)))
            counts.append(n_valid)
        loss = float(np.average(losses, weights=counts)) if losses else float("nan")
        metrics = {"eval_loss": round(loss, 5)}
        if self.compute_metrics is not None:
            extra = self.compute_metrics(self.model, data)
            metrics.update({k if k.startswith("eval_") else f"eval_{k}": v
                            for k, v in extra.items()})
        return metrics

    def _do_eval(self) -> dict:
        metrics = self.evaluate()
        metrics["step"] = self.step
        self.log_history.append(metrics)
        print(json.dumps(metrics))
        if self.logger is not None:
            self.logger.log(metrics)
        a = self.args
        key = a.metric_for_best_model if a.metric_for_best_model.startswith("eval_") \
            else f"eval_{a.metric_for_best_model}"
        if key in metrics and a.load_best_model_at_end:
            val = metrics[key]
            greater = a.greater_is_better
            if greater is None:
                greater = not key.endswith("loss")
            better = (self.best_metric is None
                      or (val > self.best_metric if greater else val < self.best_metric))
            if better:
                self.best_metric = val
                self.best_ckpt = self.save_checkpoint(tag="best")
        return metrics

    # ------------------------------------------------------------------
    def save_checkpoint(self, tag: Optional[str] = None, final: bool = False) -> str:
        # epoch / in-epoch cursor / data-order seed: lets a resumed run (and
        # a human reading meta.json) verify the replay position the step
        # count implies (mid-epoch resume fidelity); eval-only trainers
        # (train_data=None) have no epoch structure to record
        spe = (max(self.steps_per_epoch(), 1)
               if self.train_data is not None else 1)
        return ckpt_lib.save(
            self.args.output_dir, self.step, self.trainable,
            nnx.state(self.optimizer),
            tag=tag, save_total_limit=self.args.save_total_limit,
            log_history=self.log_history, final=final,
            extra_meta={"epoch": self.step // spe,
                        "batch_in_epoch": self.step % spe,
                        "data_seed": self.args.seed,
                        # restored on resume so a resumed run cannot
                        # clobber checkpoint-best with a worse model
                        "best_metric": self.best_metric,
                        "best_ckpt": self.best_ckpt},
            rng_state=nnx.state(self.model, nnx.RngState))

    def load_checkpoint(self, path: str):
        trainable, opt_state, meta, rng_state = ckpt_lib.load(
            path, self.trainable, nnx.state(self.optimizer),
            nnx.state(self.model, nnx.RngState))
        nnx.update(self.model, trainable)
        nnx.update(self.optimizer, opt_state)
        nnx.update(self.model, rng_state)
        if meta.get("step"):
            self.step = meta["step"]
        if self._n_merged:
            # the wm caches hold whatever params were live BEFORE the load;
            # stale merged operands would silently serve the old weights
            from sparse_matrix_fine_tuning_tpu.peft.surgery import refresh_merged
            refresh_merged(self.model)

    def _maybe_resume(self):
        last, completed = ckpt_lib.get_last_checkpoint(
            self.args.output_dir, even_if_completed=True)
        meta_path = os.path.join(last, "meta.json") if last else ""
        ckpt_step = 0
        if last and os.path.exists(meta_path):
            with open(meta_path) as f:
                ckpt_step = json.load(f).get("step", 0)
        if jax.process_count() > 1:
            # every host must take the SAME resume decision or the SPMD
            # program silently desynchronizes (proc 0 resumes at step k,
            # others start fresh).  Broadcast proc 0's view and fail
            # loudly on divergence -- which means the checkpoint dir is
            # not on storage visible to every process.
            from jax.experimental import multihost_utils
            local = np.asarray(
                [int(last is not None), int(completed), ckpt_step], np.int32)
            root = np.asarray(multihost_utils.broadcast_one_to_all(local))
            if not np.array_equal(local, root):
                raise RuntimeError(
                    f"multihost resume divergence: process "
                    f"{jax.process_index()} sees (found={bool(local[0])}, "
                    f"completed={bool(local[1])}, step={int(local[2])}) in "
                    f"{self.args.output_dir!r} but process 0 sees "
                    f"(found={bool(root[0])}, completed={bool(root[1])}, "
                    f"step={int(root[2])}); checkpoints must live on "
                    f"storage visible to every process")
        if last is None:
            return
        if completed and ckpt_step >= self.num_training_steps():
            # genuinely finished at this budget: LOAD the finished weights
            # so train() no-ops (step >= total) instead of silently
            # retraining from scratch and clobbering the finished artifacts
            print(f"Run already completed at {last}; loading it")
            self.load_checkpoint(last)
            self._restore_run_state()
            return
        if completed:
            # budget extension (HPO rung growth): continue the finished
            # shorter run instead of restarting from scratch
            os.remove(os.path.join(self.args.output_dir, "completed"))
        print(f"Resuming from {last}")
        self.load_checkpoint(last)
        self._restore_run_state()

    def _restore_run_state(self):
        """Re-read best-model tracking + log history on resume so
        load_best_model_at_end compares against the PRE-crash best and the
        history file is appended to, not rewritten."""
        # meta.json lives in each checkpoint dir; read the freshest one
        last, _ = ckpt_lib.get_last_checkpoint(
            self.args.output_dir, even_if_completed=True)
        if last is not None and os.path.exists(os.path.join(last, "meta.json")):
            with open(os.path.join(last, "meta.json")) as f:
                meta = json.load(f)
            if meta.get("best_metric") is not None:
                self.best_metric = meta["best_metric"]
                bc = meta.get("best_ckpt")
                if bc is not None and os.path.isdir(bc):
                    self.best_ckpt = bc
        hist_path = os.path.join(self.args.output_dir, "log_history.json")
        if not self.log_history and os.path.exists(hist_path):
            try:
                with open(hist_path) as f:
                    self.log_history = json.load(f)
            except (json.JSONDecodeError, OSError):
                pass
