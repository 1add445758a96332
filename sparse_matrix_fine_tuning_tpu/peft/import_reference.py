"""Import reference-trained adapter checkpoints.

The reference's trainers save ONLY the trainable parameters
(``MyAwesomeTrainer.save_model`` filters ``requires_grad``, reference
train_utils.py:297-307): Monarch factors (``blkdiag1``/``blkdiag2``/
``blkdiag_mult``), ``Scaler`` parameters, and the task head.  This module
maps such a torch state_dict onto a model adapted here with
``peft.init_monarch`` so adapters trained with the reference carry over.

Both frameworks use the same factor layout -- ``blkdiag1 (nblocks, blk_r,
in_blksz)``, ``blkdiag2 (nblocks, out_blksz, blk_r)`` (reference
monarch_linear.py:157-166) -- so factors copy through unchanged; torch
``nn.Linear`` heads transpose ``weight`` into our ``kernel``.

Caveat carried over from the reference (qlora_monarch.py:828-833): a
checkpoint written after ``model.eval()`` has the adapter MERGED into the
(unsaved) dense weights and the saved factors are still the unmerged ones,
so reloading is only exact for checkpoints saved in train mode -- the same
limitation the reference has.
"""

from typing import Dict, List, Tuple

import jax.numpy as jnp
import numpy as np

__all__ = ["load_reference_adapters", "export_reference_adapters",
           "save_reference_adapters"]

# final path components this importer understands
_FACTORS = ("blkdiag1", "blkdiag2", "blkdiag_mult")


def _np(t) -> np.ndarray:
    return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)


def _resolve(model, parts: List[str]):
    """Walk ``model`` along a torch module path.  Integer tokens index into
    module lists; an ``encoder`` token with no matching attribute is skipped
    (torch ``roberta.encoder.layer.N`` is ``roberta.layer[N]`` here)."""
    obj = model
    for tok in parts:
        if tok.isdigit():
            obj = obj[int(tok)]
        elif hasattr(obj, tok):
            obj = getattr(obj, tok)
        elif tok == "encoder":
            continue
        else:
            raise KeyError(
                f"cannot resolve {'.'.join(parts)!r}: no attribute {tok!r} "
                f"on {type(obj).__name__}")
    return obj


def _set(param, value: np.ndarray, key: str) -> None:
    cur = param[...]
    if tuple(cur.shape) != tuple(value.shape):
        raise ValueError(
            f"shape mismatch for {key!r}: checkpoint {tuple(value.shape)} "
            f"vs model {tuple(cur.shape)} -- was the model adapted with the "
            "same peft_config (nblocks/blk_r/target_modules)?")
    param.set_value(jnp.asarray(value, dtype=cur.dtype))


def load_reference_adapters(model, state_dict: Dict, *,
                            strict: bool = True) -> Tuple[List[str], List[str]]:
    """Load a reference trainable-only checkpoint into an adapted model.

    model: a model already adapted with ``peft.init_monarch`` using the same
    ``peft_config`` the checkpoint was trained with.
    state_dict: torch state_dict (or {key: ndarray}) as saved by the
    reference's trainable-only ``save_model``; also accepts a path to a
    ``.bin``/``.safetensors`` file.
    strict: raise on keys this importer cannot place (False: skip them).

    Returns (loaded_keys, skipped_keys).
    """
    if isinstance(state_dict, str):
        from sparse_matrix_fine_tuning_tpu.models.hf_convert import (
            load_state_dict)
        state_dict = load_state_dict(state_dict)

    loaded, skipped = [], []
    # group torch Linear heads so weight+bias set together
    for key, value in state_dict.items():
        parts = key.removeprefix("module.").split(".")
        leaf = parts[-1]
        try:
            if leaf in _FACTORS:
                mod = _resolve(model, parts[:-1])
                _set(getattr(mod, leaf), _np(value), key)
            elif len(parts) >= 2 and parts[-2] == "scaler" and leaf == "scaler":
                # <layer>.scaler.scaler -- Scaler's scale parameter
                mod = _resolve(model, parts[:-1])
                _set(mod.scaler, _np(value), key)
            elif len(parts) >= 3 and parts[-3] == "scaler" and parts[-2] == "norm":
                # <layer>.scaler.norm.{weight,bias} (affine LayerNorm)
                mod = _resolve(model, parts[:-1])
                target = mod.scale if leaf == "weight" else mod.bias
                _set(target, _np(value), key)
            elif leaf in ("weight", "bias"):
                # task-head torch Linears (classifier.dense, classifier
                # .out_proj, pooler, lm_head, score): weight transposes into
                # our kernel
                mod = _resolve(model, parts[:-1])
                if leaf == "weight":
                    arr = _np(value)
                    _set(mod.kernel, arr.T if arr.ndim == 2 else arr, key)
                else:
                    _set(mod.bias, _np(value), key)
            else:
                raise KeyError(f"unrecognized trainable key {key!r}")
        except (KeyError, AttributeError) as e:
            if strict:
                raise KeyError(
                    f"cannot import {key!r}: {e}.  Pass strict=False to "
                    "skip unplaceable keys.") from e
            skipped.append(key)
            continue
        loaded.append(key)
    return loaded, skipped


def export_reference_adapters(model, extra_paths=None) -> Dict[str, np.ndarray]:
    """The reverse direction: our trained adapter state as a torch-style
    state_dict with the REFERENCE's key paths, so checkpoints trained here
    validate/serve with the reference (or any torch consumer of its
    trainable-only format).

    Exports exactly what ``trainable_filter`` selects (AdapterParam/LoRAParam
    leaves + head paths), with ``kernel``->``weight`` transposed back to the
    torch orientation and ``roberta.layer``/``deberta.layer`` rewritten to
    the torch ``encoder.layer`` nesting.
    """
    from flax import nnx

    from sparse_matrix_fine_tuning_tpu.peft.surgery import (
        DEFAULT_TRAINABLE_PATHS,
        trainable_filter,
    )
    filt = trainable_filter(tuple(extra_paths) if extra_paths is not None
                            else DEFAULT_TRAINABLE_PATHS)
    out: Dict[str, np.ndarray] = {}
    for path, leaf in nnx.state(model, filt).flat_state():
        toks = [str(getattr(p, "key", p)) for p in path]
        # torch nests encoder-family layer stacks one level deeper
        fixed = []
        for i, tok in enumerate(toks):
            if tok == "layer" and i > 0 and toks[i - 1] in ("roberta",
                                                            "deberta"):
                fixed.append("encoder")
            fixed.append(tok)
        value = np.asarray(leaf[...])
        if fixed[-1] == "kernel":
            fixed[-1] = "weight"
            if value.ndim == 2:
                value = value.T
        elif fixed[-1] == "scale":  # LayerNorm scale -> torch weight
            fixed[-1] = "weight"
        out[".".join(fixed)] = value
    return out


def save_reference_adapters(model, path: str, extra_paths=None) -> None:
    """Write ``export_reference_adapters`` output as a torch ``.bin`` (or
    ``.safetensors`` when the path says so) the reference can load."""
    sd = export_reference_adapters(model, extra_paths)
    if path.endswith(".safetensors"):
        from safetensors.numpy import save_file
        save_file(sd, path)
    else:
        import torch
        torch.save({k: torch.tensor(v) for k, v in sd.items()}, path)
