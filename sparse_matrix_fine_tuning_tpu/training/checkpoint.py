"""Trainable-params-only checkpointing.

The reference saves only ``requires_grad`` params (adapter checkpoints are
MBs, not GBs -- train_utils.py:297-307) and resumes by scanning
``checkpoint-*`` dirs with a ``completed`` marker (train_utils.py:575-589).

Format: the trainable NNX state and optimizer state are stored in one
``.npz`` per tree with entries KEYED BY TREE PATH (e.g.
``layers/3/q_proj/blkdiag1``), so a checkpoint survives structural
reordering of unrelated parts and any model/optimizer mismatch fails
loudly by NAME -- a positional ``leaf_{i}`` layout (round 1) silently
misaligns older checkpoints after any structure change.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Optional

import jax
import numpy as np


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        elif hasattr(p, "name"):
            parts.append(str(p.name))
        else:
            parts.append(str(p))
    return "/".join(parts)


def _is_prng_key(x) -> bool:
    return (hasattr(x, "dtype")
            and jax.dtypes.issubdtype(x.dtype, jax.dtypes.prng_key))


def _save_tree(path: str, tree) -> None:
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    arrays = {}
    for p, x in flat:
        if hasattr(x, "shape") or np.isscalar(x):
            key = _path_str(p)
            assert key not in arrays, f"duplicate checkpoint key {key!r}"
            if _is_prng_key(x):  # typed PRNG keys -> raw uint32 key data
                x = jax.random.key_data(x)
            arrays[key] = np.asarray(x)
    np.savez(path, **arrays)


def _load_tree(path: str, template, strict: bool = False):
    data = np.load(path, allow_pickle=False)
    flat, treedef = jax.tree_util.tree_flatten_with_path(template)
    legacy = data.files and all(k.startswith("leaf_") for k in data.files)
    new_leaves = []
    for i, (p, tmpl) in enumerate(flat):
        key = f"leaf_{i}" if legacy else _path_str(p)
        if key in data.files:
            arr = data[key]
            if _is_prng_key(tmpl):
                arr = jax.random.wrap_key_data(
                    jax.numpy.asarray(arr),
                    impl=jax.random.key_impl(tmpl))
            elif hasattr(tmpl, "shape"):
                assert arr.shape == tuple(tmpl.shape), (
                    f"checkpoint entry {key!r} shape {arr.shape} != "
                    f"live state {tuple(tmpl.shape)}")
                arr = jax.numpy.asarray(arr, dtype=tmpl.dtype)
            new_leaves.append(arr)
        elif strict and (hasattr(tmpl, "shape") or np.isscalar(tmpl)):
            raise KeyError(f"checkpoint at {path} is missing entry {key!r}")
        else:
            new_leaves.append(tmpl)
    return jax.tree.unflatten(treedef, new_leaves)


def save(output_dir: str, step: int, trainable, opt_state, *,
         tag: Optional[str] = None, save_total_limit: int = 0,
         log_history: Optional[list] = None, final: bool = False,
         extra_meta: Optional[dict] = None, rng_state=None) -> str:
    name = f"checkpoint-{tag}" if tag else f"checkpoint-{step}"
    path = os.path.join(output_dir, name)
    if jax.process_count() > 1 and jax.process_index() != 0:
        # multihost: trainable/opt state is replicated, so process 0's
        # write is complete; other hosts return the same path without
        # touching the filesystem (it may even be shared storage) -- but
        # they must WAIT at the barrier below so no host races ahead and
        # reads (load_best_model_at_end, resume) a half-written checkpoint
        _barrier(f"ckpt_save:{name}:{step}")
        return path
    os.makedirs(path, exist_ok=True)
    _save_tree(os.path.join(path, "trainable.npz"), trainable)
    _save_tree(os.path.join(path, "opt_state.npz"), opt_state)
    if rng_state is not None:
        # dropout/rng streams (keys + counts): restoring them makes a
        # resumed run draw the same masks an uninterrupted run would
        # (reference behavior: HF Trainer saves rng_state.pth)
        _save_tree(os.path.join(path, "rng_state.npz"), rng_state)
    meta = {"step": step}
    if extra_meta:
        meta.update(extra_meta)
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f)
    if log_history is not None:
        with open(os.path.join(output_dir, "log_history.json"), "w") as f:
            json.dump(log_history, f, indent=1)
    if final:
        open(os.path.join(output_dir, "completed"), "w").close()
    if save_total_limit:
        _prune(output_dir, save_total_limit)
    if jax.process_count() > 1:
        # release the non-primary hosts only after the write finished
        _barrier(f"ckpt_save:{name}:{step}")
    return path


def _barrier(key: str) -> None:
    """Cross-host barrier keyed by ``key`` (all processes must pass the
    same key).  Serializes multihost checkpoint writes against reads."""
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices(key)


def _prune(output_dir: str, limit: int):
    if limit <= 0:
        return
    ckpts = []
    for d in os.listdir(output_dir):
        suffix = d[len("checkpoint-"):] if d.startswith("checkpoint-") else ""
        if suffix.isdigit():
            ckpts.append((int(suffix), d))
    ckpts.sort()
    for _, d in ckpts[:-limit]:
        shutil.rmtree(os.path.join(output_dir, d), ignore_errors=True)


def load(path: str, trainable_template, opt_state_template,
         rng_state_template=None):
    """Restore (trainable, opt_state, meta[, rng_state]) using the live
    states as structural templates.  rng_state is returned (possibly just
    the template) only when a template is given."""
    if jax.process_count() > 1:
        # no host may read a checkpoint another host might still be
        # writing; pairs with the barrier at the end of save()
        _barrier(f"ckpt_load:{os.path.basename(path)}")
    trainable = _load_tree(os.path.join(path, "trainable.npz"),
                           trainable_template, strict=True)
    opt_path = os.path.join(path, "opt_state.npz")
    opt_state = opt_state_template
    if os.path.exists(opt_path):
        opt_state = _load_tree(opt_path, opt_state_template)
    meta = {}
    meta_path = os.path.join(path, "meta.json")
    if os.path.exists(meta_path):
        meta = json.load(open(meta_path))
    if rng_state_template is None:
        return trainable, opt_state, meta
    rng_path = os.path.join(path, "rng_state.npz")
    rng_state = rng_state_template
    if os.path.exists(rng_path):
        rng_state = _load_tree(rng_path, rng_state_template)
    return trainable, opt_state, meta, rng_state


def get_last_checkpoint(output_dir: str, *, even_if_completed: bool = False):
    """(last_checkpoint_path_or_None, completed) -- reference
    train_utils.py:575-589 semantics.  ``even_if_completed`` returns the
    path regardless of the ``completed`` marker (budget-extension resume:
    an HPO survivor's next rung continues a finished shorter run)."""
    if not os.path.isdir(output_dir):
        return None, False
    completed = os.path.exists(os.path.join(output_dir, "completed"))
    if completed and not even_if_completed:
        return None, True
    max_step, best = 0, None
    for d in os.listdir(output_dir):
        if d.startswith("checkpoint-") and d[len("checkpoint-"):].isdigit():
            s = int(d[len("checkpoint-"):])
            if s > max_step:
                max_step, best = s, os.path.join(output_dir, d)
    return best, completed
