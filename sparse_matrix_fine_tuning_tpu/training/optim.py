"""Optimizer construction: AdamW with the reference's 3 parameter groups.

Mirrors ``MyAwesomeTrainer.create_optimizer`` (reference train_utils.py:309-374):
  group 1 "decay":    default lr, weight decay
  group 2 "no_decay": default lr, wd 0 -- biases and LayerNorm params
  group 3 "large_lr": boosted lr (``new_lr``) for ``blkdiag2``/``blkdiag_mult``
                      (or ``scaler`` when a scaler is used), wd 0 when scaler

Implemented as ``optax.multi_transform`` over path-derived labels instead of
mutating param-group lists.
"""

from __future__ import annotations

from typing import Optional

import optax


def build_schedule(lr: float, total_steps: int, warmup_ratio: float = 0.06,
                   kind: str = "linear") -> optax.Schedule:
    """Warmup + decay schedule (reference: HF TrainingArguments
    lr_scheduler_type + warmup_ratio, task_configs/*/cola.json)."""
    warmup = max(int(total_steps * warmup_ratio), 0)
    if kind == "constant":
        if warmup == 0:
            return optax.constant_schedule(lr)
        return optax.join_schedules(
            [optax.linear_schedule(0.0, lr, warmup), optax.constant_schedule(lr)],
            [warmup])
    decay_steps = max(total_steps - warmup, 1)
    if kind == "cosine":
        decay = optax.cosine_decay_schedule(lr, decay_steps)
    elif kind == "linear":
        decay = optax.linear_schedule(lr, 0.0, decay_steps)
    else:
        raise ValueError(f"unknown schedule {kind}")
    if warmup == 0:
        return decay
    return optax.join_schedules(
        [optax.linear_schedule(0.0, lr, warmup), decay], [warmup])


_NO_DECAY_MARKERS = ("bias", "layernorm", "layer_norm", "norm", "scale")


def _path_str(path) -> str:
    return "/".join(str(p) for p in path).lower()


def param_group_label(path, *, use_scaler: bool = False) -> str:
    """Group label for one parameter path (reference train_utils.py:316-323)."""
    p = _path_str(path)
    large = ("scaler",) if use_scaler else ("blkdiag2", "blkdiag_mult")
    if any(m in p for m in large):
        return "large_lr"
    if any(m in p for m in _NO_DECAY_MARKERS):
        return "no_decay"
    return "decay"


def build_optimizer(
    trainable_state,
    *,
    learning_rate: float,
    total_steps: int,
    warmup_ratio: float = 0.06,
    lr_scheduler_type: str = "linear",
    weight_decay: float = 0.0,
    large_lr: bool = False,
    new_lr: float = 5e-3,
    use_scaler: bool = False,
    adam_b1: float = 0.9,
    adam_b2: float = 0.999,
    adam_eps: float = 1e-8,
    max_grad_norm: Optional[float] = 1.0,
    gradient_accumulation_steps: int = 1,
    optim: str = "adamw",
):
    """Build the optax transform + the label pytree for a trainable state.

    optim: "adamw" (f32 moments) or "adamw8bit" -- blockwise int8 moments
    with fp32 kept for embedding paths (training/adam8bit.py; reference
    bitsandbytes Adam8bit + GlobalOptimManager override,
    train_utils.py:360-372).
    """
    sched = build_schedule(learning_rate, total_steps, warmup_ratio, lr_scheduler_type)
    if large_lr:
        big_lr_sched = build_schedule(new_lr, total_steps, warmup_ratio, lr_scheduler_type)
        big_wd = 0.0 if use_scaler else weight_decay
    else:
        big_lr_sched = sched
        big_wd = weight_decay

    if optim == "adamw8bit":
        from sparse_matrix_fine_tuning_tpu.training.adam8bit import adamw8bit

        def adamw(s, wd):
            return adamw8bit(s, b1=adam_b1, b2=adam_b2, eps=adam_eps,
                             weight_decay=wd)
    elif optim == "adamw":
        def adamw(s, wd):
            return optax.adamw(s, b1=adam_b1, b2=adam_b2, eps=adam_eps, weight_decay=wd)
    else:
        raise ValueError(f"unknown optim {optim!r} (adamw | adamw8bit)")

    transforms = {
        "decay": adamw(sched, weight_decay),
        "no_decay": adamw(sched, 0.0),
        "large_lr": adamw(big_lr_sched, big_wd),
    }

    import jax

    def labeler(params):
        # called by optax at both init and update time; the NNX state trees
        # differ (Variables as nodes vs raw leaves), so labels are computed
        # fresh from paths each call
        return jax.tree_util.tree_map_with_path(
            lambda path, _: param_group_label(path, use_scaler=use_scaler),
            params,
        )

    tx = optax.multi_transform(transforms, labeler)
    if max_grad_norm:
        tx = optax.chain(optax.clip_by_global_norm(max_grad_norm), tx)
    if gradient_accumulation_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=gradient_accumulation_steps)
    return tx
