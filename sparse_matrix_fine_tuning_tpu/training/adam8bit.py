"""8-bit-state AdamW: blockwise int8-quantized moments.

TPU-native analogue of the reference's bitsandbytes ``Adam8bit`` with the
``GlobalOptimManager`` embedding override (reference train_utils.py:360-372:
embeddings are registered to keep fp32 optimizer bits).  Adam's m/v moments
are stored int8 with one f32 absmax scale per 256-value block -- a ~3.7x
cut of optimizer-state HBM -- while leaves matching ``fp32_predicate``
(default: any path containing "embed") keep exact f32 moments, because
embedding gradients are sparse/spiky and quantize poorly (the reason the
reference overrides them).

The adam math itself runs in f32 every step (dequantize -> update ->
requantize); only the at-rest state is compressed, matching bnb semantics.
Like bnb, quantization is DYNAMIC (log-spaced codebook), not linear: Adam's
second moment spans many orders of magnitude within one block, and a linear
absmax int8 rounds its small entries to zero, which explodes
``m / (sqrt(v) + eps)`` -- the codebook keeps ~3% RELATIVE error at every
magnitude instead.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

_BLOCK = 256

# log-spaced codebooks over [~1e-7, 1] of the blockwise-normalized values
# (bnb's create_dynamic_map equivalent): signed for m, unsigned for v
_POS = np.geomspace(1e-7, 1.0, 127)
_SIGNED_CB = jnp.asarray(np.concatenate(
    [-_POS[::-1], [0.0], _POS]).astype(np.float32))          # 255 entries
_UNSIGNED_CB = jnp.asarray(np.concatenate(
    [[0.0], np.geomspace(1e-7, 1.0, 255)]).astype(np.float32))  # 256 entries


def _path_str(path) -> str:
    parts = [str(getattr(p, "key", getattr(p, "name", p))) for p in path]
    # NNX passes Variable-wrapped trees at init time but raw-leaf grad trees
    # at update time; drop the wrapper's trailing accessor so both agree
    # (only the LAST part -- "value" is also a legitimate attention module
    # name mid-path)
    if parts and parts[-1] in ("value", "raw_value"):
        parts = parts[:-1]
    return "/".join(parts).lower()


def default_fp32_predicate(path_s: str) -> bool:
    return "embed" in path_s


def _quantize(x, codebook, block=_BLOCK):
    flat = x.reshape(-1)
    pad = (-flat.size) % block
    padded = jnp.pad(flat, (0, pad)).reshape(-1, block)
    scale = jnp.maximum(jnp.max(jnp.abs(padded), axis=1, keepdims=True),
                        1e-30)
    y = padded / scale  # in [-1, 1]
    mids = (codebook[1:] + codebook[:-1]) / 2
    q = jnp.searchsorted(mids, y).astype(jnp.uint8)
    return q, scale


def _dequantize(q, scale, codebook, shape):
    size = 1
    for d in shape:
        size *= d
    vals = codebook[q.astype(jnp.int32)] * scale
    return vals.reshape(-1)[:size].reshape(shape)


class ScaleByAdam8bitState(NamedTuple):
    count: jax.Array
    moments: dict  # path_str -> {"mq","ms","vq","vs"} or {"m","v"}


def scale_by_adam8bit(b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8,
                      fp32_predicate: Optional[Callable[[str], bool]]
                      = default_fp32_predicate) -> optax.GradientTransformation:
    fp32_predicate = fp32_predicate or (lambda _: False)

    def init(params):
        moments = {}
        for path, p in jax.tree_util.tree_flatten_with_path(params)[0]:
            key = _path_str(path)
            z = jnp.zeros(jnp.shape(p), jnp.float32)
            if fp32_predicate(key):
                moments[key] = {"m": z, "v": z}
            else:
                mq, ms = _quantize(z, _SIGNED_CB)
                vq, vs = _quantize(z, _UNSIGNED_CB)
                moments[key] = {"mq": mq, "ms": ms, "vq": vq, "vs": vs}
        return ScaleByAdam8bitState(count=jnp.zeros((), jnp.int32),
                                    moments=moments)

    def update(updates, state, params=None):
        del params
        count = state.count + 1
        c = count.astype(jnp.float32)
        bc1 = 1.0 - b1 ** c
        bc2 = 1.0 - b2 ** c
        flat, treedef = jax.tree_util.tree_flatten_with_path(updates)
        new_moments = {}
        outs = []
        for path, g in flat:
            key = _path_str(path)
            rec = state.moments[key]
            g32 = g.astype(jnp.float32)
            if "m" in rec:
                m, v = rec["m"], rec["v"]
            else:
                m = _dequantize(rec["mq"], rec["ms"], _SIGNED_CB, g.shape)
                v = _dequantize(rec["vq"], rec["vs"], _UNSIGNED_CB, g.shape)
            m = b1 * m + (1.0 - b1) * g32
            v = b2 * v + (1.0 - b2) * g32 * g32
            u = (m / bc1) / (jnp.sqrt(v / bc2) + eps)
            outs.append(u.astype(g.dtype))
            if "m" in rec:
                new_moments[key] = {"m": m, "v": v}
            else:
                mq, ms = _quantize(m, _SIGNED_CB)
                vq, vs = _quantize(v, _UNSIGNED_CB)
                new_moments[key] = {"mq": mq, "ms": ms, "vq": vq, "vs": vs}
        return (jax.tree_util.tree_unflatten(treedef, outs),
                ScaleByAdam8bitState(count=count, moments=new_moments))

    return optax.GradientTransformation(init, update)


def adamw8bit(learning_rate, b1: float = 0.9, b2: float = 0.999,
              eps: float = 1e-8, weight_decay: float = 0.0,
              fp32_predicate=default_fp32_predicate
              ) -> optax.GradientTransformation:
    """Drop-in ``optax.adamw`` replacement with int8 at-rest moments."""
    return optax.chain(
        scale_by_adam8bit(b1=b1, b2=b2, eps=eps,
                          fp32_predicate=fp32_predicate),
        optax.add_decayed_weights(weight_decay),
        optax.scale_by_learning_rate(learning_rate),
    )
