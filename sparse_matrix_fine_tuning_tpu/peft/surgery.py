"""Model surgery: inject Monarch adapters into transformer linears.

The TPU-native equivalent of the reference's ``init_monarch`` /
``peft_module.set_monarch_recursive`` monkey-patch walk
(reference train_utils.py:413-511): recursively replace every attribute
named in ``peft_config["target_modules"]`` that is an ``nnx.Linear`` with a
``MonarchLinear`` built from the old weights.

Freezing is structural rather than flag-based: adapter parameters are
``AdapterParam`` variables, everything else stays ``nnx.Param``; training
code takes gradients only w.r.t. the trainable filter (adapters + any extra
paths such as the classifier head, mirroring train_utils.py:499-505).
"""

from __future__ import annotations

import math
from typing import Any, Iterable, Optional

import jax.numpy as jnp
from flax import nnx

from sparse_matrix_fine_tuning_tpu.layers.monarch_linear import (
    AdapterParam,
    MonarchLinear,
)

# Paths that stay trainable alongside adapters (classification/pooler/LM
# heads -- reference train_utils.py:394-400, 500).
DEFAULT_TRAINABLE_PATHS = ("classifier", "score", "pooler", "lm_head")


def _sqrt_factor(n: int) -> int:
    """Factor of n closest below sqrt(n) (reference train_utils.py:421-426)."""
    return [i for i in range(1, math.floor(math.sqrt(n)) + 1) if n % i == 0][-1]


def _iter_parents(module: nnx.Module):
    """Yield (parent_module, attr_name, child_module) over the module tree,
    including list entries."""
    seen = set()

    def rec(m):
        if id(m) in seen:
            return
        seen.add(id(m))
        items = []
        if isinstance(m, (nnx.List,)):
            items = [(str(i), v) for i, v in enumerate(m)]
        else:
            items = list(vars(m).items())
        for name, child in items:
            if isinstance(child, nnx.Module):
                yield (m, name, child)
                yield from rec(child)

    yield from rec(module)


def init_monarch(
    model: nnx.Module,
    peft_config: dict,
    *,
    rngs: Optional[nnx.Rngs] = None,
    dtype=None,
    param_dtype=jnp.float32,
    impl: str = "auto",
) -> list[tuple[str, tuple, tuple, tuple]]:
    """Replace target linears with Monarch adapters, in place.

    Args:
      model: an NNX model (RobertaModel / LlamaForCausalLM / ...).
      peft_config: reference-format dict; uses ``monarch``, ``target_modules``,
        ``nblocks`` (int or "sqrt(n)"), ``blk_r``, ``adapter``, etc.
    Returns:
      list of (name, dense_shape, blkdiag1_shape, blkdiag2_shape) describing
      the adapted layers (reference's ``adapted_layers`` print,
      train_utils.py:466, 508-510).
    """
    if not peft_config.get("monarch", True):
        return []
    rngs = rngs or nnx.Rngs(0)
    targets = set(peft_config["target_modules"])
    adapted = []
    cfg_nblocks = peft_config.get("nblocks", 4)
    for parent, name, child in list(_iter_parents(model)):
        if name not in targets or not isinstance(child, nnx.Linear):
            continue
        kernel = child.kernel[...]  # (in, out)
        in_f, out_f = kernel.shape
        w = kernel.T  # (out, in) linear orientation
        bias = child.bias[...] if child.bias is not None else None
        if peft_config.get("adapter", True) and cfg_nblocks != "sqrt(n)":
            nblocks = cfg_nblocks
        else:
            nblocks = _sqrt_factor(in_f)
        new_layer = MonarchLinear(
            in_f, out_f,
            peft_config=peft_config,
            weights=w,
            bias=bias,
            nblocks=nblocks,
            dtype=dtype,
            param_dtype=param_dtype,
            impl=impl,
            rngs=rngs,
        )
        if isinstance(parent, nnx.List):
            parent[int(name)] = new_layer
        else:
            setattr(parent, name, new_layer)
        adapted.append((name, (out_f, in_f),
                        tuple(new_layer.blkdiag1[...].shape),
                        tuple(new_layer.blkdiag2[...].shape)))
    return adapted


def trainable_filter(extra_paths: Iterable[str] = DEFAULT_TRAINABLE_PATHS):
    """NNX filter selecting trainable state: adapter params + head paths.

    Mirrors the reference freeze walk (train_utils.py:499-505): MonarchLinear
    + Scaler params and anything under a classifier-like path train;
    everything else is frozen.
    """
    extra_paths = tuple(extra_paths)
    if "__all__" in extra_paths:
        return nnx.Param  # full fine-tuning: every parameter trains
    filters = [nnx.OfType(AdapterParam), nnx.OfType(nnx.LoRAParam)]
    for p in extra_paths:
        filters.append(nnx.All(nnx.Param, nnx.PathContains(p)))
    return nnx.Any(*filters)


def split_trainable(model: nnx.Module, extra_paths: Iterable[str] = DEFAULT_TRAINABLE_PATHS):
    """Split the model into (graphdef, trainable_state, frozen_state)."""
    filt = trainable_filter(extra_paths)
    graphdef, trainable, frozen = nnx.split(model, filt, ...)
    return graphdef, trainable, frozen


def param_stats(model: nnx.Module, *, training: bool = True,
                extra_paths: Iterable[str] = DEFAULT_TRAINABLE_PATHS,
                skip_cls: bool = True, verbose: bool = True):
    """Parameter count summary (reference train_utils.py:126-156).

    Returns (total, trainable) counts; asserts trainable > 0 when training.
    """
    _, trainable, frozen = split_trainable(model, extra_paths)
    def count(state, skip=None):
        tot = 0
        for path, leaf in state.flat_state():
            if skip and any(skip in str(p) for p in path):
                continue
            v = leaf[...] if isinstance(leaf, nnx.Variable) else leaf
            if v is not None and hasattr(v, "size"):
                tot += v.size
        return tot
    n_train = count(trainable, skip="classifier" if skip_cls else None)
    n_total = count(trainable) + count(frozen)
    if verbose:
        pct = 100 * n_train / max(n_total, 1)
        print(f"Total parameters: {n_total / 1024**2:.3f}M, "
              f"trainable: {n_train / 1024**2:.3f}M ({pct:.3f}%)")
    if training:
        assert n_train > 0, "There's a bug: you're training nothing!"
    return n_total, n_train


def merge_all_adapters(model: nnx.Module) -> int:
    """Fold every MonarchLinear adapter into its dense weights (inference)."""
    n = 0
    for _, _, child in _iter_parents(model):
        if isinstance(child, MonarchLinear) and child.as_adapter and not child.merged:
            child.merge_adapter()
            n += 1
    return n


def unmerge_all_adapters(model: nnx.Module) -> int:
    n = 0
    for _, _, child in _iter_parents(model):
        if isinstance(child, MonarchLinear) and child.as_adapter and child.merged:
            child.unmerge_adapter()
            n += 1
    return n


def find_all_linear_names(model: nnx.Module, exclude: tuple = ("lm_head",)) -> list[str]:
    """Attribute names of all nnx.Linear layers (reference
    train_utils.py:592-602); used to extend target_modules to every linear."""
    names = set()
    for _, name, child in _iter_parents(model):
        if isinstance(child, nnx.Linear):
            names.add(name)
    for e in exclude:
        names.discard(e)
    return sorted(names)


class ScaledLoRA(nnx.LoRA):
    """nnx.LoRA with peft's LoraConfig semantics (the reference's LoRA
    source, train_utils.py:404-407 / qlora.py:366-372):

    ``y = base(x) + (dropout(x) @ A @ B) * (lora_alpha / r)``

    A init: peft default kaiming_uniform(a=sqrt(5)) (uniform bound
    1/sqrt(in_features)) or "gaussian" (normal std 1/r); B zeros.  Verified
    weight-for-weight against the installed peft library
    (tests/reference_parity/test_lora_parity.py)."""

    def __init__(self, in_features: int, rank: int, out_features: int, *,
                 base_module, alpha: Optional[float] = None,
                 dropout: float = 0.0, init_lora_weights=True,
                 rngs: nnx.Rngs):
        if init_lora_weights == "gaussian":
            a_init = nnx.initializers.normal(stddev=1.0 / rank)
        else:  # peft default: kaiming_uniform(a=sqrt(5)) = U(+-1/sqrt(fan_in))
            a_init = nnx.initializers.variance_scaling(
                1.0 / 3.0, "fan_in", "uniform")
        super().__init__(in_features, rank, out_features,
                         base_module=base_module, a_initializer=a_init,
                         rngs=rngs)
        self.scaling = float(alpha) / rank if alpha is not None else 1.0
        self.dropout = (nnx.Dropout(dropout, deterministic=True, rngs=rngs)
                        if dropout > 0 else None)

    def __call__(self, x):
        xb = self.dropout(x) if self.dropout is not None else x
        a = self.lora_a[...].astype(x.dtype)
        b = self.lora_b[...].astype(x.dtype)
        return self.base_module(x) + (xb @ a @ b) * self.scaling


def init_lora(
    model: nnx.Module,
    peft_config: dict,
    *,
    rngs: Optional[nnx.Rngs] = None,
) -> list[str]:
    """LoRA baseline: wrap target linears with an additive low-rank branch
    (reference train_utils.py:404-407 via the peft library).  Honors the
    reference config keys r/rank, lora_alpha (scaling alpha/r),
    lora_dropout, init_lora_weights; params are LoRAParam (trainable via
    filter)."""
    rngs = rngs or nnx.Rngs(0)
    targets = set(peft_config["target_modules"])
    rank = peft_config.get("r", peft_config.get("rank", 8))
    alpha = peft_config.get("lora_alpha")
    dropout = peft_config.get("lora_dropout", 0.0)
    init_w = peft_config.get("init_lora_weights", True)
    adapted = []
    for parent, name, child in list(_iter_parents(model)):
        if name not in targets or not isinstance(child, nnx.Linear):
            continue
        in_f, out_f = child.kernel[...].shape
        lora = ScaledLoRA(in_f, rank, out_f, base_module=child, alpha=alpha,
                          dropout=dropout, init_lora_weights=init_w,
                          rngs=rngs)
        if isinstance(parent, nnx.List):
            parent[int(name)] = lora
        else:
            setattr(parent, name, lora)
        adapted.append(name)
    return adapted


def enable_merged_training(model: nnx.Module, min_dim: int = 0) -> int:
    """Enable merge-during-training (kernels/merged.py) on every eligible
    MonarchLinear.  Returns the number of layers enabled.  Costs one extra
    dense-sized cache pair per layer -- intended for memory-comfortable
    configs; the fused-add path remains the fallback.

    min_dim: only enable layers with min(in, out) >= min_dim.  Measured on
    v5e: the per-step merge rebuild pays off from ~4096-dim projections
    (the Llama-7B shapes, +1.92x adapter-overhead cut) but loses ~9% on
    2048-dim models -- the trainer's "auto" mode passes 4096."""
    count = 0
    for _, _, child in _iter_parents(model):
        if isinstance(child, MonarchLinear) and child.can_merge_train() \
                and min(child.in_features, child.out_features) >= min_dim:
            child.enable_merged_training()
            count += 1
    return count


def refresh_merged(model: nnx.Module) -> int:
    """Rebuild every merged-training cache from the current factors.
    jit-safe: the trainer calls this at the top of each optimizer step."""
    count = 0
    for _, _, child in _iter_parents(model):
        if isinstance(child, MonarchLinear) and getattr(child, "wm_cache", None) is not None:
            child.refresh_merged()
            count += 1
    return count


def disable_merged_training(model: nnx.Module) -> int:
    count = 0
    for _, _, child in _iter_parents(model):
        if isinstance(child, MonarchLinear) and getattr(child, "wm_cache", None) is not None:
            child.disable_merged_training()
            count += 1
    return count
